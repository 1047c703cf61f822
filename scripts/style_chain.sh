#!/bin/bash
# wrdChrWrStyl end-to-end chain (VERDICT r2 next #6): train the style
# encoder -> build the writer style dict -> train a style-replace DDPM
# on writer-styled renders -> sample per-writer with the dict.
# The in-repo equivalent of feature_extractor.py -> cropStyleDict ->
# --wrdChrWrStyl 1 (reference unet.py:1159-1161, 1616-1618).
set -e
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

echo "=== 1. Triplet-trained writer-style encoder + style dict ==="
python -m worddiffusion_tpu.cli.train_style --synthetic 1 \
    --writers 8 --samples_per_writer 24 --epochs 12 --batch_size 16 \
    --lr 1e-4 --save_dir runs/style_syn

echo "=== 2. Writer-styled latent cache (round-2 VAE) ==="
python -m worddiffusion_tpu.cli.build_latent_cache --synthetic 1 \
    --vocab_size 10 --samples_per_word 128 --writer_styled 1 \
    --vae_ckpt runs/vae_syn/ckpt --out runs/latents_style.npz

echo "=== 3. Style-replace flagship latent DDPM ==="
python -m worddiffusion_tpu.cli.train --preset iam --synthetic 1 \
    --vocab_size 10 --samples_per_word 128 --latent 1 \
    --latent_cache runs/latents_style.npz --vae_ckpt runs/vae_syn/ckpt \
    --wrdChrWrStyl 1 --style_dict runs/style_syn/style_dict.npz \
    --epochs 600 --batch_size 128 --ckpt_every_epochs 200 \
    --save_path runs/demo_style

echo "=== 4. Per-writer sampling with the trained dict ==="
python -m worddiffusion_tpu.cli.sample --preset iam \
    --ckpt_dir runs/demo_style/ckpt --vae_ckpt runs/vae_syn/ckpt \
    --wrdChrWrStyl 1 --style_dict runs/style_syn/style_dict.npz \
    --words the,hand --writer 0 --n 4 --save_path runs/style_samples_w0
python -m worddiffusion_tpu.cli.sample --preset iam \
    --ckpt_dir runs/demo_style/ckpt --vae_ckpt runs/vae_syn/ckpt \
    --wrdChrWrStyl 1 --style_dict runs/style_syn/style_dict.npz \
    --words the,hand --writer 5 --n 4 --save_path runs/style_samples_w5
echo "=== chain done ==="
