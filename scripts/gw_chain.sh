#!/bin/bash
# George-Washington-preset end-to-end chain: the third dataset family
# proven train -> regenerate on the chip (after IAM docs/OCR_LOOP.md
# SS1-5 and Norwegian SS7). Exercises what the GW scripts exercise in
# the reference (trainGWModifyCondition.py / regenerateFromtrain2GW.py):
# MAX_CHARS 16, UNetModelPhosc layout, phos version 'gw', PHOSC
# conditioning end to end. One stage at a time on the single chip.
#
# The round-2/3 run dirs are git-ignored and do not survive workspace
# resets, so stages 1-2 retrain the frozen OCR gate and codec when
# missing (identical recipes to scripts/iam_chain.sh).
set -e
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

if [ ! -d runs/ocr_syn/ckpt ]; then
  echo "=== 1. Frozen CTC recognizer (the filter) ==="
  python -m worddiffusion_tpu.cli.train_ocr --synthetic 1 \
      --vocab_size 100 --samples_per_word 24 --eval_renders 4 \
      --epochs 60 --batch_size 64 --lr 1e-3 --save_dir runs/ocr_syn
fi

if [ ! -d runs/vae_syn/ckpt ]; then
  echo "=== 2. Frozen latent codec (in-repo VAE) ==="
  python -m worddiffusion_tpu.cli.train_vae --synthetic 1 \
      --vocab_size 100 --samples_per_word 8 --epochs 200 \
      --batch_size 16 --save_every_epochs 50 --save_dir runs/vae_syn
fi

echo "=== 3. Latent cache for the GW corpus ==="
python -m worddiffusion_tpu.cli.build_latent_cache --synthetic 1 \
    --preset gw --vocab_size 10 --samples_per_word 96 \
    --vae_ckpt runs/vae_syn/ckpt --out runs/latents_gw.npz

echo "=== 4. GW-preset latent DDPM (PHOSC conditioning, MAX_CHARS 16) ==="
python -m worddiffusion_tpu.cli.train --preset gw --synthetic 1 \
    --vocab_size 10 --samples_per_word 96 --latent 1 \
    --latent_cache runs/latents_gw.npz --vae_ckpt runs/vae_syn/ckpt \
    --epochs 800 --batch_size 120 --ckpt_every_epochs 200 \
    --save_path runs/demo_gw

echo "=== 4b. gt file for the regen corpus ==="
python - <<'PYEOF'
from worddiffusion_tpu.data.synthetic import synthetic_corpus, word_list
samples = synthetic_corpus(words=word_list(10, "gw"), samples_per_word=96)
with open("runs/gw_gt.csv", "w") as f:
    for s in samples:
        f.write(f"{s.writer},{s.image.removesuffix('.png')} {s.word}\n")
print("wrote", len(samples), "rows")
PYEOF

echo "=== 5. OCR-filtered regeneration (full sampling, 599 calls) ==="
python -m worddiffusion_tpu.cli.regenerate --preset gw \
    --ckpt_dir runs/demo_gw/ckpt --gt_file runs/gw_gt.csv \
    --vae_ckpt runs/vae_syn/ckpt --ocr_ckpt runs/ocr_syn/ckpt \
    --dump_path runs/regen_gw --batch_size 120 --fullSampling 1
echo "=== chain done ==="
