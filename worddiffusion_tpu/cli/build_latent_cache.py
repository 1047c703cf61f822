"""Latent-cache builder CLI: one jitted VAE-encode pass over a dataset
-> npz cache (the in-repo replacement for the reference's latent
pickles, ``trainModifyCondition.py:303-325``).

  python -m worddiffusion_tpu.cli.build_latent_cache \
      --gt_train ./gt/train.filter27 --iam_path ./crops \
      --stable_dif_path ./vae.safetensors --out ./latents.npz
"""

from __future__ import annotations

import argparse
import logging

import numpy as np


def main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="iam")
    p.add_argument("--gt_train", default="")
    p.add_argument("--iam_path", default="")
    p.add_argument("--stable_dif_path", default="")
    p.add_argument("--out", required=True)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--deterministic", type=int, default=0,
                   help="1: store the posterior mean instead of a sample")
    p.add_argument("--synthetic", type=int, default=0)
    args = p.parse_args(argv)

    import dataclasses

    import jax

    from ..configs import presets
    from ..data.dataset import WordImageDataset
    from ..data.gt import WriterRegistry, parse_gt
    from ..data.latent_cache import build_latent_cache
    from ..data.synthetic import synthetic_corpus
    from ..data.tokenizer import Tokenizer
    from ..models.vae import AutoencoderKL, convert_diffusers_vae

    exp = presets.get(args.preset)
    exp = exp.replace(data=dataclasses.replace(exp.data, image_dir=args.iam_path))
    if args.synthetic or not args.gt_train:
        samples = synthetic_corpus(samples_per_word=8)
        registry = WriterRegistry()
        for s in samples:
            registry.add(s.writer)
    else:
        samples, registry = parse_gt(args.gt_train)
    tok = Tokenizer.from_name(exp.data.alphabet, exp.data.max_chars)
    ds = WordImageDataset(samples, registry, tok, exp.data)

    vae = AutoencoderKL(exp.vae)
    if args.stable_dif_path:
        from safetensors.numpy import load_file

        params = convert_diffusers_vae(load_file(args.stable_dif_path), exp.vae)
    else:
        logging.warning("no --stable_dif_path: random VAE (cache only useful for testing)")
        params = vae.init(
            jax.random.PRNGKey(0),
            np.zeros((1, exp.data.img_height, exp.data.img_width, 3), np.float32),
            jax.random.PRNGKey(0),
        )
    cache = build_latent_cache(
        ds, vae, params, batch_size=args.batch_size,
        sample_posterior=not args.deterministic, out_path=args.out,
    )
    logging.info("wrote %d latents to %s", len(cache), args.out)


if __name__ == "__main__":
    main()
