#!/bin/bash
# Full IAM-preset OCR-in-the-loop chain (docs/OCR_LOOP.md §1-§5) as one
# command: recognizer -> VAE -> latent cache -> flagship latent DDPM ->
# OCR-filtered regeneration (3 sampling modes) -> eval harness
# (OCR agreement + PHOSC-feature FID, full row set). One stage at a
# time on the single chip; ~2-3 h total from scratch. Stages 1-2 are
# resumable (skipped when a non-empty ckpt dir exists). Artifacts land
# in runs/ (weights git-ignored, logs/eval JSONs committed); numbers
# quoted in docs/OCR_LOOP.md.
set -e
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

# stage guards check a completion marker (an interrupted training run
# leaves a non-empty ckpt dir — that alone must not skip the stage)
if [ ! -e runs/ocr_syn/.done ]; then
  echo "=== 1. Frozen CTC recognizer (the filter) ==="
  python -m worddiffusion_tpu.cli.train_ocr --synthetic 1 \
      --vocab_size 100 --samples_per_word 24 --eval_renders 4 \
      --epochs 60 --batch_size 64 --lr 1e-3 --save_dir runs/ocr_syn
  touch runs/ocr_syn/.done
fi

if [ ! -e runs/vae_syn/.done ]; then
  echo "=== 2. Frozen latent codec (in-repo VAE) ==="
  python -m worddiffusion_tpu.cli.train_vae --synthetic 1 \
      --vocab_size 100 --samples_per_word 8 --epochs 200 \
      --batch_size 16 --save_every_epochs 50 --save_dir runs/vae_syn
  touch runs/vae_syn/.done
fi

if [ ! -e runs/demo_latent/ckpt/10000 ]; then
  echo "=== 3. Latent cache -> flagship latent DDPM ==="
  python -m worddiffusion_tpu.cli.build_latent_cache --synthetic 1 \
      --vocab_size 10 --samples_per_word 128 \
      --vae_ckpt runs/vae_syn/ckpt --out runs/latents_demo.npz
  python -m worddiffusion_tpu.cli.train --preset iam --synthetic 1 \
      --vocab_size 10 --samples_per_word 128 --latent 1 \
      --latent_cache runs/latents_demo.npz --vae_ckpt runs/vae_syn/ckpt \
      --epochs 1000 --batch_size 128 --ckpt_every_epochs 200 \
      --save_path runs/demo_latent
fi

echo "=== 3b. Regen gt file + real-render comparison set ==="
python - <<'PYEOF'
import os
from PIL import Image
from worddiffusion_tpu.data.synthetic import render_word, stable_seed, synthetic_corpus, word_list

samples = synthetic_corpus(words=word_list(10), samples_per_word=128)
with open("runs/demo_gt.csv", "w") as f:
    for s in samples:
        f.write(f"{s.writer},{s.image.removesuffix('.png')} {s.word}\n")
os.makedirs("runs/real_demo", exist_ok=True)
for s in samples:
    arr = render_word(s.word, 64, 256, seed=stable_seed(s.image))
    Image.fromarray(arr).save(os.path.join("runs/real_demo", s.image))
print("wrote", len(samples), "gt rows + real renders")
PYEOF

echo "=== 4. OCR-filtered regeneration: skip-step / full / DDIM ==="
python -m worddiffusion_tpu.cli.regenerate --preset iam \
    --ckpt_dir runs/demo_latent/ckpt --gt_file runs/demo_gt.csv \
    --vae_ckpt runs/vae_syn/ckpt --ocr_ckpt runs/ocr_syn/ckpt \
    --dump_path runs/regen_demo --batch_size 128 \
    --writers_dict runs/demo_latent/writers_dict_train.json
python -m worddiffusion_tpu.cli.regenerate --preset iam \
    --ckpt_dir runs/demo_latent/ckpt --gt_file runs/demo_gt.csv \
    --vae_ckpt runs/vae_syn/ckpt --ocr_ckpt runs/ocr_syn/ckpt \
    --dump_path runs/regen_full --batch_size 128 --fullSampling 1 \
    --writers_dict runs/demo_latent/writers_dict_train.json
python -m worddiffusion_tpu.cli.regenerate --preset iam \
    --ckpt_dir runs/demo_latent/ckpt --gt_file runs/demo_gt.csv \
    --vae_ckpt runs/vae_syn/ckpt --ocr_ckpt runs/ocr_syn/ckpt \
    --dump_path runs/regen_ddim --batch_size 128 --ddim 50 \
    --keep_rejected 1 \
    --writers_dict runs/demo_latent/writers_dict_train.json

echo "=== 5. Eval harness: OCR agreement + PHOSC-feature FID rows ==="
# Build the comparison subsets the docs/OCR_LOOP.md §5c table pins:
#   real_floor_a/b : disjoint halves of the real renders, N matched to
#                    the accepted count (noise/bias floor of the metric)
#   unfilt_N       : accepted+rejected truncated to the accepted count
#                    (N-matched unfiltered row)
#   acc_bal/rej_bal: accepted vs rejected under a COMMON per-word
#                    histogram (min count per word), isolating style
#                    from word-mix skew
python - <<'PYEOF'
import collections, os, random, shutil

acc_dir, rej_dir, real_dir = "runs/regen_ddim", "runs/regen_ddim/rejected", "runs/real_demo"
word_of = lambda f: f.rsplit("_", 1)[-1].removesuffix(".png")
acc = sorted(f for f in os.listdir(acc_dir) if f.endswith(".png"))
acc_set = set(acc)
# a resumed regen can re-attempt a previously-rejected crop and accept
# it: the name then exists in both dirs — the accepted copy wins
rej = sorted(
    f for f in os.listdir(rej_dir) if f.endswith(".png") and f not in acc_set
)
real = sorted(f for f in os.listdir(real_dir) if f.endswith(".png"))
n = len(acc)
rng = random.Random(0)
rng.shuffle(real)

def fill(dst, src_dir, files):
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    for f in files:
        os.link(os.path.join(src_dir, f), os.path.join(dst, f))

half = min(n, len(real) // 2)  # disjoint halves cap at len(real)/2
fill("runs/fid_floor_a", real_dir, real[:half])
fill("runs/fid_floor_b", real_dir, real[half:2 * half])
unfilt = sorted(acc + rej)[: n]
shutil.rmtree("runs/fid_unfilt", ignore_errors=True)
os.makedirs("runs/fid_unfilt")
for f in unfilt:
    src = acc_dir if f in acc_set else rej_dir
    os.link(os.path.join(src, f), os.path.join("runs/fid_unfilt", f))
ha = collections.Counter(word_of(f) for f in acc)
hr = collections.Counter(word_of(f) for f in rej)
common = {w: min(ha[w], hr[w]) for w in set(ha) & set(hr)}
def balanced(files):
    left = dict(common)
    out = []
    for f in files:
        w = word_of(f)
        if left.get(w, 0) > 0:
            left[w] -= 1
            out.append(f)
    return out
fill("runs/fid_acc_bal", acc_dir, balanced(acc))
fill("runs/fid_rej_bal", rej_dir, balanced(rej))
print(f"accepted={n} rejected={len(rej)} balanced={sum(common.values())} per-word={common}")
PYEOF

PHOSC=runs/phosc_syn3/best_params.pkl
if [ ! -e "$PHOSC" ]; then
  echo "=== 4c. PHOSC-ZSL evaluator (weights too large for git: 319 MB;"
  echo "        this stage regenerates them — docs/OCR_LOOP.md 5b.2) ==="
  python -m worddiffusion_tpu.cli.train_phosc --mode train --synthetic 1 \
      --n_synth 1600 --renders_per_word 24 --writer_styles 1 --augment 40 \
      --epochs 80 --batch_size 64 --lr 3e-4 --save_dir runs/phosc_syn3
  python -m worddiffusion_tpu.cli.train_phosc --mode test --synthetic 1 \
      --n_synth 1600 --renders_per_word 24 --writer_styles 1 --augment 40 \
      --batch_size 64 --save_dir runs/phosc_syn3 --seed 0
fi
EV="python -m worddiffusion_tpu.cli.evaluate --phosc_params $PHOSC"
$EV --real_dir runs/fid_floor_a --fake_dir runs/fid_floor_b \
    --out runs/eval_fid_realfloor.json
$EV --real_dir runs/real_demo --fake_dir runs/regen_ddim \
    --ocr_ckpt runs/ocr_syn/ckpt --out runs/eval_fid_filtered.json
$EV --real_dir runs/real_demo --fake_dir runs/fid_unfilt \
    --out runs/eval_fid_unfilt.json
$EV --real_dir runs/real_demo --fake_dir runs/fid_acc_bal \
    --out runs/eval_fid_accbal.json
$EV --real_dir runs/real_demo --fake_dir runs/fid_rej_bal \
    --out runs/eval_fid_rejbal.json
echo "=== chain done ==="
