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


def main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="iam")
    p.add_argument("--gt_train", default="")
    p.add_argument("--iam_path", default="")
    p.add_argument("--stable_dif_path", default="")
    p.add_argument("--vae_ckpt", default="",
                   help="orbax dir from cli.train_vae (in-repo codec)")
    p.add_argument("--out", required=True)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--deterministic", type=int, default=0,
                   help="1: store the posterior mean instead of a sample")
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--vocab_size", type=int, default=10)
    p.add_argument("--samples_per_word", type=int, default=8)
    p.add_argument("--writer_styled", type=int, default=0,
                   help="1: synthetic renders use per-writer styles "
                        "(required for a --wrdChrWrStyl training cache)")
    args = p.parse_args(argv)

    import dataclasses

    from ..configs import presets
    from ..data.dataset import WordImageDataset
    from ..data.gt import WriterRegistry, parse_gt
    from ..data.latent_cache import build_latent_cache
    from ..data.synthetic import synthetic_corpus
    from ..data.tokenizer import Tokenizer
    from .sample import make_vae

    exp = presets.get(args.preset)
    exp = exp.replace(data=dataclasses.replace(exp.data, image_dir=args.iam_path))
    if args.synthetic or not args.gt_train:
        from ..data.synthetic import corpus_lang, word_list

        samples = synthetic_corpus(
            words=word_list(args.vocab_size, lang=corpus_lang(exp.data)),
            samples_per_word=args.samples_per_word,
        )
        registry = WriterRegistry()
        for s in samples:
            registry.add(s.writer)
    else:
        samples, registry = parse_gt(args.gt_train)
    tok = Tokenizer.from_name(exp.data.alphabet, exp.data.max_chars)
    ds = WordImageDataset(samples, registry, tok, exp.data,
                          writer_styled=bool(args.writer_styled))

    vae, params = make_vae(exp, args.stable_dif_path, args.vae_ckpt)
    cache = build_latent_cache(
        ds, vae, params, batch_size=args.batch_size,
        sample_posterior=not args.deterministic, out_path=args.out,
    )
    logging.info("wrote %d latents to %s", len(cache), args.out)


if __name__ == "__main__":
    main()
