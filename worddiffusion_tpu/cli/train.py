"""Training CLI — reference-compatible flags over the typed config.

Usage (mirrors ``trainModifyCondition.py`` flags where they exist):

  python -m worddiffusion_tpu.cli.train --preset iam \
      --gt_train ./gt/gan.iam.tr_va.gt.filter27 --iam_path ./crops \
      --epochs 1000 --batch_size 128 --save_path ./runs/iam \
      [--phosc 1] [--ocrTraining 1] [--latent 1] [--stopFlagFile ./flags/stop.txt]
"""

from __future__ import annotations

import argparse
import dataclasses
import logging

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="worddiffusion-tpu trainer")
    p.add_argument("--preset", default="iam",
                   choices=["iam", "iam_base", "iam_phosc", "gw", "cvl", "norwegian"])
    p.add_argument("--gt_train", default="")
    p.add_argument("--iam_path", default="", help="word-crop image dir")
    p.add_argument("--epochs", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--img_size", default="64,256")
    p.add_argument("--save_path", default="./runs/default")
    p.add_argument("--latent", type=int, default=1)
    p.add_argument("--phosc", type=int, default=0)
    p.add_argument("--phos", type=int, default=0)
    p.add_argument("--ocrTraining", type=int, default=0)
    p.add_argument("--wrdChrWrStyl", type=int, default=0)
    p.add_argument("--charImages", type=int, default=0)
    p.add_argument("--imgConditioned", type=int, default=0)
    p.add_argument("--style_dict", default="",
                   help="npz of writer->style vectors from cli.train_style "
                        "(required with --wrdChrWrStyl 1)")
    p.add_argument("--allow_random_style", type=int, default=0,
                   help="1: permit a random-init style dict (plumbing "
                        "tests only)")
    p.add_argument("--augMaps", type=int, default=0)
    p.add_argument("--vaeFromDict", type=int, default=0)
    p.add_argument("--latent_cache", default="", help="npz from latent-cache builder")
    p.add_argument("--preview_ddim", type=int, default=50,
                   help="DDIM steps for epoch previews; 0 = full DDPM "
                        "(the reference preview path)")
    p.add_argument("--vae_ckpt", default="",
                   help="orbax dir from cli.train_vae (in-repo codec)")
    p.add_argument("--stable_dif_path", default="",
                   help="diffusers VAE checkpoint (safetensors) to load")
    p.add_argument("--ckpt_every_epochs", type=int, default=0,
                   help="override the preset's checkpoint/preview cadence "
                        "(reference: every 5 epochs)")
    p.add_argument("--stopFlagFile", default="")
    p.add_argument("--loadPrev", type=int, default=0,
                   help="resume from the latest checkpoint; --epochs is the "
                        "TOTAL target, and the resumed run continues "
                        "bit-identically to an uninterrupted one "
                        "(Trainer.run RNG & resume contract)")
    p.add_argument("--partialLoad", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mesh_data", type=int, default=-1)
    p.add_argument("--mesh_model", type=int, default=1)
    p.add_argument("--synthetic", type=int, default=0,
                   help="train on the synthetic corpus (no image dir needed)")
    p.add_argument("--vocab_size", type=int, default=10,
                   help="synthetic mode: distinct words")
    p.add_argument("--samples_per_word", type=int, default=16)
    p.add_argument("--hiGanArch", type=int, default=0,
                   help="1: BigGAN-style generator as the denoiser")
    return p


def experiment_from_args(args) -> "Experiment":
    from ..configs import presets
    from ..configs.config import MeshConfig

    exp = presets.get(args.preset)
    if args.phosc or args.phos:
        exp = presets.get("iam_phosc") if args.preset == "iam" else exp
    h, w = (int(v) for v in args.img_size.split(","))
    exp = exp.replace(
        data=dataclasses.replace(
            exp.data,
            gt_path=args.gt_train,
            image_dir=args.iam_path,
            img_height=h,
            img_width=w,
            latent=bool(args.latent),
            latent_cache=args.latent_cache or None,
            batch_size=args.batch_size,
        ),
        train=dataclasses.replace(
            exp.train,
            lr=args.lr,
            epochs=args.epochs,
            save_path=args.save_path,
            stop_flag_file=args.stopFlagFile or None,
            ctc_weight=0.1 if args.ocrTraining else 0.0,
            seed=args.seed,
            **({"ckpt_every_epochs": args.ckpt_every_epochs}
               if args.ckpt_every_epochs else {}),
        ),
        mesh=MeshConfig(data=args.mesh_data, model=args.mesh_model),
        unet=dataclasses.replace(
            exp.unet,
            ocr_head=bool(args.ocrTraining),
            style_vec_dim=4096 if args.wrdChrWrStyl else 0,
            # reference --wrdChrWrStyl 1: the projected style sequence
            # REPLACES the char context (unet.py:1616-1618) — word
            # identity is carried only by the writer/style conditioning
            style_replace_context=bool(args.wrdChrWrStyl),
            use_char_images=bool(args.charImages),
            img_conditioned=bool(args.imgConditioned),
            in_channels=4 if args.latent else 3,
            out_channels=4 if args.latent else 3,
        ),
    )
    return exp


def _build_style_lookup(args, exp, samples, registry, tokenizer):
    """writer -> 4096-d style vector for ``--wrdChrWrStyl`` (the in-repo
    ``cropStyleDict_Numpy.pkl``, ``unet.py:1159-1161``). Loads
    ``--style_dict`` if given; otherwise encodes a few crops per writer
    with the (random-init unless trained separately) StyleEncoder."""
    import numpy as _np

    if args.style_dict:
        with _np.load(args.style_dict, allow_pickle=False) as z:
            return {k: z[k] for k in z.files}
    if not args.allow_random_style:
        raise SystemExit(
            "--wrdChrWrStyl 1 needs --style_dict (train one: python -m "
            "worddiffusion_tpu.cli.train_style). Random-init style "
            "vectors train a model conditioned on noise; pass "
            "--allow_random_style 1 only for plumbing tests."
        )
    import jax as _jax

    from ..data.dataset import WordImageDataset as _DS
    from ..models.style import StyleEncoder, build_style_dict

    logging.warning(
        "--allow_random_style: building writer style vectors with a "
        "randomly initialised StyleEncoder (NOT meaningful styles)"
    )
    probe = _DS(samples, registry, tokenizer, exp.data, seed=args.seed)
    by_writer: dict = {}
    for i, s in enumerate(samples):
        if len(by_writer.setdefault(s.writer, [])) < 4:
            by_writer[s.writer].append(
                _np.asarray(probe[i]["image"], _np.float32)
            )
    by_writer = {w: _np.stack(v) for w, v in by_writer.items()}
    enc = StyleEncoder(out_dim=4096)
    enc_params = enc.init(
        _jax.random.PRNGKey(0),
        _np.zeros((1, exp.data.img_height, exp.data.img_width, 3), _np.float32),
    )
    return build_style_dict(enc, enc_params, by_writer)


def main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    args = build_parser().parse_args(argv)
    exp = experiment_from_args(args)

    from ..data.augment import random_augment
    from ..data.dataset import LatentLookup, WordImageDataset
    from ..data.gt import parse_gt
    from ..data.loader import host_shard
    from ..data.synthetic import synthetic_corpus
    from ..data.gt import WriterRegistry
    from ..data.tokenizer import Tokenizer
    from ..parallel.distributed import initialize_multihost
    from ..train.loop import Trainer

    # multi-host SPMD (no-op single-process): DCN coordination up
    # BEFORE any backend use, then per-host data sharding
    pid, pcount = initialize_multihost()
    if pcount > 1:
        logging.info("multi-host: process %d/%d", pid, pcount)

    if args.synthetic or not args.gt_train:
        from ..data.synthetic import corpus_lang, word_list

        samples = synthetic_corpus(
            # nor/cvl presets render their own word lists so AEOA glyphs
            # / digits+punctuation actually exercise the extended
            # tokenizer alphabets
            words=word_list(args.vocab_size, lang=corpus_lang(exp.data)),
            samples_per_word=args.samples_per_word,
        )
        registry = WriterRegistry()
        for s in samples:
            registry.add(s.writer)
    else:
        samples, registry = parse_gt(args.gt_train, partial_load=args.partialLoad)
    if pcount > 1:
        # registry is built from the FULL corpus on every host (writer
        # ids must agree globally); only the sample list is sharded
        samples = host_shard(samples, pid, pcount)
    if args.save_path:
        import os

        os.makedirs(args.save_path, exist_ok=True)
        # writers_dict_train.json compat (trainModifyCondition.py:1061-1064)
        registry.dump_json(f"{args.save_path}/writers_dict_train.json")

    tokenizer = Tokenizer.from_name(exp.data.alphabet, exp.data.max_chars)
    cache = LatentLookup.load(args.latent_cache) if args.latent_cache else None

    style_lookup = None
    if args.wrdChrWrStyl:
        style_lookup = _build_style_lookup(args, exp, samples, registry, tokenizer)

    dataset = WordImageDataset(
        samples, registry, tokenizer, exp.data,
        use_phosc=exp.unet.use_phosc,
        latent_cache=cache,
        augment_fn=random_augment if args.augMaps else None,
        ocr_alphabet=None,
        style_lookup=style_lookup,
        char_images=exp.unet.use_char_images,
        char_image_size=exp.unet.char_image_size,
        cond_latents=exp.unet.img_conditioned,
        seed=args.seed,
        # synthetic corpora only carry a writer-style signal when asked
        # for (real data has real writer styles already)
        writer_styled=bool(args.wrdChrWrStyl and (args.synthetic or not args.gt_train)),
    )

    encode_fn = None
    vae = vae_params = None
    if exp.data.latent:
        import jax

        from ..models.vae import encode_to_latent
        from .sample import make_vae

        vae, vae_params = make_vae(exp, args.stable_dif_path, args.vae_ckpt)
        if cache is None:
            enc = jax.jit(lambda imgs, rng: encode_to_latent(vae, vae_params, imgs, rng))
            encode_fn = lambda imgs, rng: enc(imgs, rng)

    import os

    os.makedirs(args.save_path, exist_ok=True)
    model = None
    if args.hiGanArch:
        from ..models.higan import HiGanDenoiserAdapter

        model = HiGanDenoiserAdapter(exp.unet)

    # epoch preview grids of the fixed probe words (reference
    # train.py:298-313), sampled with the EMA weights. ≈divergence
    # (documented in PARITY.md): previews default to DDIM-50 for speed;
    # --preview_ddim 0 restores the reference's full-DDPM previews.
    preview_fn = None
    if not args.hiGanArch:
        import jax

        from ..generate.sample import WordSampler
        from ..utils.images import save_image_grid

        sampler = WordSampler(exp, None, vae, vae_params,
                              ddim_steps=args.preview_ddim)

        def preview_fn(state, epoch):
            sampler.params = state.ema_params
            imgs = np.asarray(
                sampler.sample_preview(jax.random.PRNGKey(epoch))
            ).astype(np.float32)
            if imgs.max() > 1.5:  # uint8 sampler output
                imgs = imgs / 255.0
            save_image_grid(
                imgs, f"{args.save_path}/images/epoch_{epoch:04d}.png", ncol=3
            )
            return imgs  # Trainer mirrors to wandb/JSONL (train.py:311-313)

    trainer = Trainer(
        exp, dataset, encode_fn=encode_fn, model=model, preview_fn=preview_fn
    )
    trainer.run(epochs=args.epochs, resume=bool(args.loadPrev))


if __name__ == "__main__":
    main()
