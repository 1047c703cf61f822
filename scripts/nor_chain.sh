#!/bin/bash
# Norwegian end-to-end chain (VERDICT r2 next #8): train -> regenerate
# on synthetic renders of the nor alphabet, with accept-rate artifact.
# Reuses the round-2 in-repo VAE (runs/vae_syn). One stage at a time on
# the single chip.
set -e
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

echo "=== 1. Norwegian CTC recognizer (extended alphabet) ==="
python -m worddiffusion_tpu.cli.train_ocr --synthetic 1 --lang nor \
    --vocab_size 90 --samples_per_word 24 --eval_renders 4 \
    --epochs 60 --batch_size 64 --lr 1e-3 --save_dir runs/ocr_nor

echo "=== 2. Latent cache for the nor corpus (round-2 VAE) ==="
python -m worddiffusion_tpu.cli.build_latent_cache --synthetic 1 \
    --preset norwegian --vocab_size 10 --samples_per_word 96 \
    --vae_ckpt runs/vae_syn_v2/ckpt --out runs/latents_nor.npz

echo "=== 3. Norwegian-preset latent DDPM ==="
python -m worddiffusion_tpu.cli.train --preset norwegian --synthetic 1 \
    --vocab_size 10 --samples_per_word 96 --latent 1 \
    --latent_cache runs/latents_nor.npz --vae_ckpt runs/vae_syn_v2/ckpt \
    --epochs 800 --batch_size 120 --ckpt_every_epochs 200 \
    --save_path runs/demo_nor

echo "=== 3b. gt file for the regen corpus ==="
python - <<'PYEOF'
from worddiffusion_tpu.data.synthetic import synthetic_corpus, word_list
samples = synthetic_corpus(words=word_list(10, "nor"), samples_per_word=96)
with open("runs/nor_gt.csv", "w") as f:
    for s in samples:
        f.write(f"{s.writer},{s.image.removesuffix('.png')} {s.word}\n")
print("wrote", len(samples), "rows")
PYEOF

echo "=== 4. OCR-filtered regeneration (nor alphabet) ==="
python -m worddiffusion_tpu.cli.regenerate --preset norwegian \
    --ckpt_dir runs/demo_nor/ckpt --gt_file runs/nor_gt.csv \
    --vae_ckpt runs/vae_syn_v2/ckpt --ocr_ckpt runs/ocr_nor/ckpt \
    --dump_path runs/regen_nor --batch_size 120 --fullSampling 1
echo "=== chain done ==="
