"""Standalone held-out eval of a saved VAE checkpoint.

Mirrors the artifact block at the end of ``cli/train_vae.py`` (recon
grid + metrics.json) for runs whose training was stopped at a
checkpoint boundary rather than running to --epochs, so the committed
artifact still carries a held-out PSNR measured from the weights on
disk.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np
import orbax.checkpoint as ocp

from worddiffusion_tpu.configs import presets
from worddiffusion_tpu.data.synthetic import render_word, word_list
from worddiffusion_tpu.models.vae import AutoencoderKL
from worddiffusion_tpu.utils.images import normalize_to_unit


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--save_dir", default="runs/vae_syn")
    p.add_argument("--preset", default="iam_base")
    args = p.parse_args()

    exp = presets.get(args.preset)
    h, w = exp.data.img_height, exp.data.img_width
    vae = AutoencoderKL(exp.vae)
    shape = vae.init(
        jax.random.PRNGKey(0), np.zeros((1, h, w, 3), np.float32),
        jax.random.PRNGKey(0),
    )
    mgr = ocp.CheckpointManager(os.path.abspath(os.path.join(args.save_dir, "ckpt")))
    step = mgr.latest_step()
    params = mgr.restore(
        step, args=ocp.args.StandardRestore(jax.tree.map(np.asarray, shape))
    )

    probe = [render_word(wd, h, w, seed=77_000_000 + i)
             for i, wd in enumerate(word_list(8))]
    probe_arr = np.asarray(normalize_to_unit(np.stack(probe)))
    recon, _, _ = jax.jit(vae.apply)(params, probe_arr, jax.random.PRNGKey(1))
    recon = np.asarray(recon, np.float32)
    eval_mse = float(np.mean((recon - probe_arr) ** 2))
    eval_psnr = -10.0 * float(np.log10(max(eval_mse / 4.0, 1e-10)))
    strip = np.concatenate(
        [np.concatenate([o, r], axis=1)
         for o, r in zip(probe_arr, np.clip(recon, -1, 1))], axis=0
    )
    from PIL import Image

    Image.fromarray(((strip + 1) * 127.5).astype(np.uint8)).save(
        os.path.join(args.save_dir, "recon_grid.png")
    )
    with open(os.path.join(args.save_dir, "metrics.json"), "w") as f:
        json.dump({"heldout_mse": eval_mse, "heldout_psnr_db": eval_psnr,
                   "steps": int(step)}, f)
    print(f"step {step}: held-out recon PSNR {eval_psnr:.1f} dB")


if __name__ == "__main__":
    main()
