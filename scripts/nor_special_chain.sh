#!/bin/bash
# Norwegian ÆØÅ end-to-end: train the nor-preset DDPM on the FULL
# 90-word synthetic vocabulary (includes the 14 å/ø/æ words), then
# regenerate ONLY the special-character words through the OCR gate —
# proves the extended alphabet (tokenizer, renderer, recognizer,
# conditioning) end to end, not just on ASCII-safe Norwegian.
set -e
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

echo "=== 1. Latent cache, full nor vocab ==="
python -m worddiffusion_tpu.cli.build_latent_cache --synthetic 1 \
    --preset norwegian --vocab_size 90 --samples_per_word 24 \
    --vae_ckpt runs/vae_syn_v2/ckpt --out runs/latents_nor90.npz

echo "=== 2. Norwegian-preset latent DDPM (90 words) ==="
python -m worddiffusion_tpu.cli.train --preset norwegian --synthetic 1 \
    --vocab_size 90 --samples_per_word 24 --latent 1 \
    --latent_cache runs/latents_nor90.npz --vae_ckpt runs/vae_syn_v2/ckpt \
    --epochs 400 --batch_size 120 --ckpt_every_epochs 100 \
    --save_path runs/demo_nor90

echo "=== 2b. gt file: ONLY the special-character words ==="
python - <<'PYEOF'
from worddiffusion_tpu.data.synthetic import synthetic_corpus, word_list
special = [w for w in word_list(90, "nor") if any(c in w for c in "æøåÆØÅ")]
print("special words:", special)
samples = synthetic_corpus(words=special, samples_per_word=48)
with open("runs/nor_special_gt.csv", "w") as f:
    for s in samples:
        f.write(f"{s.writer},{s.image.removesuffix('.png')} {s.word}\n")
print("wrote", len(samples), "rows")
PYEOF

echo "=== 3. OCR-filtered regeneration of the AEOA words ==="
python -m worddiffusion_tpu.cli.regenerate --preset norwegian \
    --ckpt_dir runs/demo_nor90/ckpt --gt_file runs/nor_special_gt.csv \
    --vae_ckpt runs/vae_syn_v2/ckpt --ocr_ckpt runs/ocr_nor/ckpt \
    --dump_path runs/regen_nor_special --batch_size 120 --fullSampling 1
echo "=== chain done ==="
