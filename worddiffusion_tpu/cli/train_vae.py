"""AutoencoderKL trainer — produces a frozen latent codec in-repo.

The reference consumes *pretrained* Stable-Diffusion VAE weights from
the author's disk (``trainModifyCondition.py:851,1130-1139``) and never
trains the codec. The rebuild keeps that path (``--stable_dif_path`` +
``convert_diffusers_vae``) but also ships this trainer so the full
latent pipeline — encode -> latent DDPM -> decode — runs end-to-end in
environments without the SD checkpoint: recon (L1 + MSE) + small KL,
AdamW, fp32 loss on bf16 activations.

  python -m worddiffusion_tpu.cli.train_vae --synthetic 1 --epochs 150 \
      --save_dir ./runs/vae
"""

from __future__ import annotations

import argparse
import json
import logging
import os

import numpy as np


def main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="iam")
    p.add_argument("--gt_train", default="")
    p.add_argument("--image_dir", default="")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--kl_weight", type=float, default=1e-6)
    p.add_argument("--save_dir", default="./runs/vae")
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--langs", default="eng",
                   help="comma-separated synthetic word-list languages "
                        "(eng,nor,gw); each contributes --vocab_size words "
                        "so one codec covers every preset's alphabet")
    p.add_argument("--vocab_size", type=int, default=100)
    p.add_argument("--samples_per_word", type=int, default=8)
    p.add_argument("--log_every", type=int, default=200)
    p.add_argument("--save_every_epochs", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax
    import orbax.checkpoint as ocp

    from ..configs import presets
    from ..data.gt import parse_gt
    from ..data.synthetic import render_word, stable_seed, synthetic_corpus, word_list
    from ..models.vae import AutoencoderKL
    from ..utils.images import normalize_to_unit, resize_and_pad

    exp = presets.get(args.preset)
    if args.synthetic or not args.gt_train:
        words: list[str] = []
        for lang in args.langs.split(","):
            words.extend(w for w in word_list(args.vocab_size, lang.strip())
                         if w not in words)
        samples = synthetic_corpus(
            words=words, samples_per_word=args.samples_per_word,
        )
    else:
        samples, _ = parse_gt(args.gt_train)

    h, w = exp.data.img_height, exp.data.img_width

    def load(s) -> np.ndarray:
        path = os.path.join(args.image_dir, s.image) if args.image_dir else ""
        if path and os.path.exists(path):
            from PIL import Image

            arr = np.asarray(Image.open(path).convert("RGB"))
        else:
            arr = render_word(s.word, h, w, seed=stable_seed(s.image))
        return resize_and_pad(arr, h, w)

    logging.info("rendering %d training images once (uint8 cache)", len(samples))
    images = np.stack([load(s) for s in samples])  # uint8 [N,H,W,3]

    vae = AutoencoderKL(exp.vae)
    rng = jax.random.PRNGKey(args.seed)
    params = vae.init(
        rng, np.zeros((1, h, w, 3), np.float32), jax.random.PRNGKey(0)
    )
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    logging.info("VAE params: %.1fM", n_params / 1e6)
    tx = optax.adamw(args.lr, weight_decay=1e-5)
    opt = tx.init(params)

    kl_w = args.kl_weight

    @jax.jit
    def step(params, opt, imgs, srng):
        def loss_fn(p):
            recon, mean, logvar = vae.apply(p, imgs, srng)
            recon = recon.astype(jnp.float32)
            l1 = jnp.mean(jnp.abs(recon - imgs))
            mse = jnp.mean((recon - imgs) ** 2)
            kl = -0.5 * jnp.mean(1 + logvar - mean**2 - jnp.exp(logvar))
            return l1 + mse + kl_w * kl, (mse, kl)

        (loss, (mse, kl)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss, mse, kl

    os.makedirs(args.save_dir, exist_ok=True)
    mgr = ocp.CheckpointManager(
        os.path.abspath(os.path.join(args.save_dir, "ckpt")),
        options=ocp.CheckpointManagerOptions(max_to_keep=2, create=True),
    )
    np_rng = np.random.default_rng(args.seed)
    gstep, last_mse = 0, float("nan")
    for epoch in range(args.epochs):
        order = np_rng.permutation(len(images))
        for start in range(0, len(images) - args.batch_size + 1, args.batch_size):
            idx = order[start : start + args.batch_size]
            imgs = jnp.asarray(normalize_to_unit(images[idx]))
            params, opt, loss, mse, kl = step(
                params, opt, imgs, jax.random.fold_in(rng, gstep)
            )
            if gstep % args.log_every == 0:
                last_mse = float(mse)
                # imgs are in [-1,1]; PSNR on the [0,1] scale
                psnr = -10.0 * np.log10(max(last_mse / 4.0, 1e-10))
                logging.info(
                    "step %d loss %.4f recon-mse %.5f psnr %.1fdB kl %.2f",
                    gstep, float(loss), last_mse, psnr, float(kl),
                )
            gstep += 1
        if (epoch + 1) % args.save_every_epochs == 0 or epoch == args.epochs - 1:
            mgr.save(gstep, args=ocp.args.StandardSave(params))
    mgr.wait_until_finished()

    # artifact: original | reconstruction strip over held-out renders
    probe = [render_word(wd, h, w, seed=77_000_000 + i)
             for i, wd in enumerate(word_list(8))]
    probe_arr = jnp.asarray(normalize_to_unit(np.stack(probe)))
    recon, _, _ = jax.jit(vae.apply)(params, probe_arr, jax.random.PRNGKey(1))
    recon = np.asarray(recon, np.float32)
    probe_np = np.asarray(probe_arr)
    eval_mse = float(np.mean((recon - probe_np) ** 2))
    eval_psnr = -10.0 * float(np.log10(max(eval_mse / 4.0, 1e-10)))
    strip = np.concatenate(
        [np.concatenate([o, r], axis=1)
         for o, r in zip(probe_np, np.clip(recon, -1, 1))], axis=0
    )
    from PIL import Image

    Image.fromarray(((strip + 1) * 127.5).astype(np.uint8)).save(
        os.path.join(args.save_dir, "recon_grid.png")
    )
    with open(os.path.join(args.save_dir, "metrics.json"), "w") as f:
        json.dump(
            {
                "train_mse_last": last_mse,
                "heldout_mse": eval_mse,
                "heldout_psnr_db": eval_psnr,
                "steps": gstep,
                "train_images": len(images),
            },
            f,
        )
    logging.info(
        "saved VAE to %s/ckpt (held-out recon PSNR %.1f dB)",
        args.save_dir, eval_psnr,
    )


if __name__ == "__main__":
    main()
