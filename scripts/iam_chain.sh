#!/bin/bash
# Full IAM-preset OCR-in-the-loop chain (docs/OCR_LOOP.md §1-§5) as one
# command: recognizer -> VAE -> latent cache -> flagship latent DDPM ->
# OCR-filtered regeneration (3 sampling modes) -> eval harness
# (OCR agreement + PHOSC-feature FID). One stage at a time on the
# single chip; ~2-3 h total. Artifacts land in runs/ (git-ignored);
# numbers quoted in docs/OCR_LOOP.md.
set -e
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

echo "=== 1. Frozen CTC recognizer (the filter) ==="
python -m worddiffusion_tpu.cli.train_ocr --synthetic 1 \
    --vocab_size 100 --samples_per_word 24 --eval_renders 4 \
    --epochs 60 --batch_size 64 --lr 1e-3 --save_dir runs/ocr_syn

echo "=== 2. Frozen latent codec (in-repo VAE) ==="
python -m worddiffusion_tpu.cli.train_vae --synthetic 1 \
    --vocab_size 100 --samples_per_word 8 --epochs 200 \
    --batch_size 16 --save_every_epochs 50 --save_dir runs/vae_syn

echo "=== 3. Latent cache -> flagship latent DDPM ==="
python -m worddiffusion_tpu.cli.build_latent_cache --synthetic 1 \
    --vocab_size 10 --samples_per_word 128 \
    --vae_ckpt runs/vae_syn/ckpt --out runs/latents_demo.npz
python -m worddiffusion_tpu.cli.train --preset iam --synthetic 1 \
    --vocab_size 10 --samples_per_word 128 --latent 1 \
    --latent_cache runs/latents_demo.npz --vae_ckpt runs/vae_syn/ckpt \
    --epochs 1000 --batch_size 128 --ckpt_every_epochs 200 \
    --save_path runs/demo_latent

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
    --dump_path runs/regen_demo --batch_size 128
python -m worddiffusion_tpu.cli.regenerate --preset iam \
    --ckpt_dir runs/demo_latent/ckpt --gt_file runs/demo_gt.csv \
    --vae_ckpt runs/vae_syn/ckpt --ocr_ckpt runs/ocr_syn/ckpt \
    --dump_path runs/regen_full --batch_size 128 --fullSampling 1
python -m worddiffusion_tpu.cli.regenerate --preset iam \
    --ckpt_dir runs/demo_latent/ckpt --gt_file runs/demo_gt.csv \
    --vae_ckpt runs/vae_syn/ckpt --ocr_ckpt runs/ocr_syn/ckpt \
    --dump_path runs/regen_ddim --batch_size 128 --ddim 50 \
    --keep_rejected 1

echo "=== 5. Eval harness: OCR agreement + PHOSC-feature FID ==="
python -m worddiffusion_tpu.cli.evaluate --real_dir runs/real_demo \
    --fake_dir runs/regen_ddim --ocr_ckpt runs/ocr_syn/ckpt \
    --phosc_params runs/phosc_syn2/best_params.pkl \
    --out runs/eval_fid_filtered.json
python -m worddiffusion_tpu.cli.evaluate --real_dir runs/real_demo \
    --fake_dir runs/regen_ddim/rejected \
    --phosc_params runs/phosc_syn2/best_params.pkl \
    --out runs/eval_fid_rejected.json
echo "=== chain done ==="
