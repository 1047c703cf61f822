#!/bin/bash
# CVL-preset end-to-end chain: the fourth dataset family proven
# train -> regenerate on the chip (after IAM docs/OCR_LOOP.md SS1-5,
# Norwegian SS7, GW SS9). Exercises what the CVL scripts exercise in
# the reference (regenerateFromtrainWord22CVL.py): the extended
# 73-symbol alphabet (digits + punctuation), MAX_CHARS 42, 310 writer
# classes. The OCR gate goes BEYOND the reference, whose CVL regen
# keeps plain-English OCR classes and so can never accept digit/punct
# words (regenerateFromtrainWord22CVL.py:106); ours reads the full
# alphabet. One stage at a time on the single chip.
set -e
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

if [ -z "$(ls runs/ocr_cvl/ckpt 2>/dev/null)" ]; then
  echo "=== 1. CVL CTC recognizer (extended digits/punct alphabet) ==="
  python -m worddiffusion_tpu.cli.train_ocr --synthetic 1 --lang cvl \
      --vocab_size 90 --samples_per_word 24 --eval_renders 4 \
      --epochs 60 --batch_size 64 --lr 1e-3 --save_dir runs/ocr_cvl
fi

if [ -z "$(ls runs/vae_cvl/ckpt 2>/dev/null)" ]; then
  echo "=== 2. Latent codec covering CVL glyphs (eng+cvl corpus) ==="
  python -m worddiffusion_tpu.cli.train_vae --synthetic 1 \
      --langs eng,cvl --vocab_size 60 --samples_per_word 8 --epochs 200 \
      --batch_size 16 --save_every_epochs 50 --save_dir runs/vae_cvl
fi

echo "=== 3. Latent cache for the CVL corpus ==="
python -m worddiffusion_tpu.cli.build_latent_cache --synthetic 1 \
    --preset cvl --vocab_size 10 --samples_per_word 96 \
    --vae_ckpt runs/vae_cvl/ckpt --out runs/latents_cvl.npz

echo "=== 4. CVL-preset latent DDPM (42-char contexts, 310 writers) ==="
python -m worddiffusion_tpu.cli.train --preset cvl --synthetic 1 \
    --vocab_size 10 --samples_per_word 96 --latent 1 \
    --latent_cache runs/latents_cvl.npz --vae_ckpt runs/vae_cvl/ckpt \
    --epochs 800 --batch_size 120 --ckpt_every_epochs 200 \
    --save_path runs/demo_cvl

echo "=== 4b. gt file for the regen corpus ==="
python - <<'PYEOF'
from worddiffusion_tpu.data.synthetic import synthetic_corpus, word_list
samples = synthetic_corpus(words=word_list(10, "cvl"), samples_per_word=96)
with open("runs/cvl_gt.csv", "w") as f:
    for s in samples:
        f.write(f"{s.writer},{s.image.removesuffix('.png')} {s.word}\n")
print("wrote", len(samples), "rows")
PYEOF

echo "=== 5. OCR-filtered regeneration (full sampling, 599 calls) ==="
python -m worddiffusion_tpu.cli.regenerate --preset cvl \
    --ckpt_dir runs/demo_cvl/ckpt --gt_file runs/cvl_gt.csv \
    --vae_ckpt runs/vae_cvl/ckpt --ocr_ckpt runs/ocr_cvl/ckpt \
    --dump_path runs/regen_cvl --batch_size 120 --fullSampling 1
echo "=== chain done ==="
