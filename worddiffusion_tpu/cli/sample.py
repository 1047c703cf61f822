"""Sampling CLI (``sampling.py`` / ``full_sampling.py`` equivalent):
generate word images from a checkpoint for a word list or a whole gt
file."""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="worddiffusion-tpu sampler")
    p.add_argument("--preset", default="iam")
    p.add_argument("--ckpt_dir", default="", help="orbax ckpt dir from training")
    p.add_argument("--torch_ckpt", default="",
                   help="reference PyTorch ckpt_*.pt / ema_*.pt to convert and sample from")
    p.add_argument("--words", default="", help="comma-separated words")
    p.add_argument("--gt_file", default="", help="regenerate every (writer,word) pair")
    p.add_argument("--writer", type=int, default=-1, help="-1: random per word")
    p.add_argument("--n", type=int, default=1, help="samples per word")
    p.add_argument("--save_path", default="./samples")
    p.add_argument("--use_ema", type=int, default=1)
    p.add_argument("--cfg_scale", type=float, default=0.0)
    p.add_argument("--ddim", type=int, default=0,
                   help="use DDIM with N steps instead of full DDPM")
    p.add_argument("--ddim_eta", type=float, default=0.0)
    p.add_argument("--stable_dif_path", default="")
    p.add_argument("--vae_ckpt", default="",
                   help="orbax dir from cli.train_vae (in-repo codec)")
    p.add_argument("--crop_whitespace", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    return p


def load_state(exp, ckpt_dir):
    import jax

    from ..models.unet import UNet
    from ..train.checkpoint import CheckpointManager
    from ..train.state import TrainState, make_optimizer

    model = UNet(exp.unet)
    rng = jax.random.PRNGKey(0)
    lat = np.zeros((2, exp.data.img_height // 8, exp.data.img_width // 8, 4), np.float32)
    params = model.init(
        rng, lat, np.zeros((2,), np.int32),
        np.zeros((2, exp.data.max_chars), np.int32), np.zeros((2,), np.int32),
        phosc_ids=np.zeros((2, exp.unet.phosc_dim), np.int32) if exp.unet.use_phosc else None,
    )
    tx = make_optimizer(exp.train.lr)
    state = TrainState.create(params, tx)
    mgr = CheckpointManager(ckpt_dir)
    return mgr.restore(state)


def make_vae(exp, stable_dif_path, vae_ckpt: str = ""):
    """Frozen codec from either a diffusers SD checkpoint
    (``--stable_dif_path``, the reference path) or an orbax directory
    written by ``cli.train_vae`` (``--vae_ckpt``, the in-repo path)."""
    import jax

    from ..models.vae import AutoencoderKL, convert_diffusers_vae

    vae = AutoencoderKL(exp.vae)
    if stable_dif_path:
        from safetensors.numpy import load_file

        return vae, convert_diffusers_vae(load_file(stable_dif_path), exp.vae)
    params = vae.init(
        jax.random.PRNGKey(0),
        np.zeros((1, exp.data.img_height, exp.data.img_width, 3), np.float32),
        jax.random.PRNGKey(0),
    )
    if vae_ckpt:
        import os

        import orbax.checkpoint as ocp

        mgr = ocp.CheckpointManager(os.path.abspath(vae_ckpt))
        step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no VAE checkpoint in {vae_ckpt}")
        params = mgr.restore(step, args=ocp.args.StandardRestore(params))
        return vae, params
    logging.warning("no --stable_dif_path / --vae_ckpt: randomly initialised VAE")
    return vae, params


def main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    args = build_parser().parse_args(argv)

    import jax

    from ..configs import presets
    from ..generate.sample import WordSampler
    from ..utils.images import crop_whitespace, denormalize_to_uint8, save_single_images

    exp = presets.get(args.preset)
    if args.torch_ckpt:
        from ..models.convert import convert_reference_unet, load_torch_checkpoint

        params = convert_reference_unet(
            load_torch_checkpoint(args.torch_ckpt), exp.unet
        )
    elif args.ckpt_dir:
        state = load_state(exp, args.ckpt_dir)
        params = state.ema_params if args.use_ema else state.params
    else:
        raise SystemExit("need --ckpt_dir or --torch_ckpt")

    vae, vae_params = (make_vae(exp, args.stable_dif_path, args.vae_ckpt)
                       if exp.data.latent else (None, None))
    sampler = WordSampler(exp, params, vae, vae_params, cfg_scale=args.cfg_scale,
                          ddim_steps=args.ddim, ddim_eta=args.ddim_eta)

    if args.gt_file:
        from ..data.gt import parse_gt

        samples, registry = parse_gt(args.gt_file)
        pairs = [(s.word, registry[s.writer]) for s in samples]
    else:
        words = [w for w in args.words.split(",") if w]
        rng_np = np.random.default_rng(args.seed)
        pairs = []
        for w in words:
            for _ in range(args.n):
                wid = (args.writer if args.writer >= 0
                       else int(rng_np.integers(0, exp.unet.num_writers)))
                pairs.append((w, wid))

    os.makedirs(args.save_path, exist_ok=True)
    rng = jax.random.PRNGKey(args.seed)
    B = 16
    for start in range(0, len(pairs), B):
        chunk = pairs[start : start + B]
        words_b = [w for w, _ in chunk]
        wids_b = [i for _, i in chunk]
        phosc = None
        if exp.unet.use_phosc:
            from ..data.phosc import phosc_vector

            phosc = np.stack([
                phosc_vector(w, exp.data.phos_version, as_int=True) for w in words_b
            ]).astype(np.int32)
        imgs = sampler.sample(words_b, wids_b, jax.random.fold_in(rng, start), phosc)
        names = [f"{start+i:05d}_{wid}_{w}.png" for i, (w, wid) in enumerate(chunk)]
        if args.crop_whitespace:
            for i in range(len(imgs)):
                cropped = crop_whitespace(denormalize_to_uint8(imgs[i]))
                from PIL import Image

                Image.fromarray(cropped).save(os.path.join(args.save_path, names[i]))
        else:
            save_single_images(imgs, names, args.save_path)
        logging.info("wrote %d images", start + len(chunk))


if __name__ == "__main__":
    main()
