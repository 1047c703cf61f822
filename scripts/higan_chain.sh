#!/bin/bash
# HiGAN-generator experiment chain (reference trainModifyConditionHiGan
# .py:317-440, --hiGanArch=1): train the BigGAN-style conditional
# generator behind the UNet signature on the same latent-diffusion
# objective, then OCR-gated regeneration + montage, so the variant has
# a demonstrated trained artifact like every other mode (VERDICT r3
# missing #1). Reuses the iam chain's frozen recognizer + codec stages
# when present. Artifacts: runs/higan_demo/metrics.jsonl (loss curve),
# accept rate in the regen log, docs/higan_regen_accepted.png.
set -e
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

if [ ! -e runs/ocr_syn/.done ]; then
  echo "=== 1. Frozen CTC recognizer (shared with iam_chain) ==="
  python -m worddiffusion_tpu.cli.train_ocr --synthetic 1 \
      --vocab_size 100 --samples_per_word 24 --eval_renders 4 \
      --epochs 60 --batch_size 64 --lr 1e-3 --save_dir runs/ocr_syn
  touch runs/ocr_syn/.done
fi

if [ ! -e runs/vae_syn/.done ]; then
  echo "=== 2. Frozen latent codec (shared with iam_chain) ==="
  python -m worddiffusion_tpu.cli.train_vae --synthetic 1 \
      --vocab_size 100 --samples_per_word 8 --epochs 200 \
      --batch_size 16 --save_every_epochs 50 --save_dir runs/vae_syn
  touch runs/vae_syn/.done
fi

if [ ! -e runs/latents_demo.npz ]; then
  echo "=== 3. Latent cache (shared corpus with iam_chain stage 3) ==="
  python -m worddiffusion_tpu.cli.build_latent_cache --synthetic 1 \
      --vocab_size 10 --samples_per_word 128 \
      --vae_ckpt runs/vae_syn/ckpt --out runs/latents_demo.npz
fi

if [ ! -e runs/higan_demo/.done ]; then
  echo "=== 4. HiGAN generator on the latent DDPM objective ==="
  python -m worddiffusion_tpu.cli.train --preset iam --synthetic 1 \
      --hiGanArch 1 \
      --vocab_size 10 --samples_per_word 128 --latent 1 \
      --latent_cache runs/latents_demo.npz --vae_ckpt runs/vae_syn/ckpt \
      --epochs 1000 --batch_size 128 --ckpt_every_epochs 200 \
      --save_path runs/higan_demo
  touch runs/higan_demo/.done
fi

echo "=== 4b. Regen gt file (same corpus) ==="
python - <<'PYEOF'
from worddiffusion_tpu.data.synthetic import synthetic_corpus, word_list
samples = synthetic_corpus(words=word_list(10), samples_per_word=128)
with open("runs/demo_gt.csv", "w") as f:
    for s in samples:
        f.write(f"{s.writer},{s.image.removesuffix('.png')} {s.word}\n")
print("wrote", len(samples), "rows")
PYEOF

echo "=== 5. OCR-gated regeneration from the HiGAN generator ==="
python -m worddiffusion_tpu.cli.regenerate --preset iam --hiGanArch 1 \
    --ckpt_dir runs/higan_demo/ckpt --gt_file runs/demo_gt.csv \
    --vae_ckpt runs/vae_syn/ckpt --ocr_ckpt runs/ocr_syn/ckpt \
    --dump_path runs/regen_higan --batch_size 128 --ddim 50 \
    --writers_dict runs/higan_demo/writers_dict_train.json

echo "=== 6. Montage of accepted crops + loss-curve summary ==="
python - <<'PYEOF'
import json, os
import numpy as np
from PIL import Image
from worddiffusion_tpu.utils.images import save_image_grid

d = "runs/regen_higan"
files = sorted(f for f in os.listdir(d) if f.endswith(".png"))[:24]
imgs = np.stack([
    np.asarray(Image.open(os.path.join(d, f)).convert("RGB"), np.float32) / 255.0
    for f in files
])
save_image_grid(imgs, "docs/higan_regen_accepted.png", ncol=4)
losses = [json.loads(l) for l in open("runs/higan_demo/metrics.jsonl")]
losses = [r for r in losses if "loss" in r]
print("montage:", len(files), "accepted crops;",
      f"loss {losses[0]['loss']:.4f} -> {losses[-1]['loss']:.4f} over",
      len(losses), "logged steps")
PYEOF
echo "=== chain done ==="
