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
    p.add_argument("--writers_dict", default="",
                   help="writers_dict_train.json from training; default: "
                        "auto-discover next to --ckpt_dir")
    p.add_argument("--writer", type=int, default=-1, help="-1: random per word")
    p.add_argument("--writer2", type=int, default=-1,
                   help="second writer id: interpolate between --writer "
                        "and --writer2 styles (reference --interpolation, "
                        "sampling.py:122-124)")
    p.add_argument("--mix_rate", type=float, default=-1.0,
                   help="interpolation weight towards --writer2; negative "
                        "(default) draws a fresh uniform(0,1) PER SAMPLE "
                        "like the reference gt-file sampler "
                        "(full_sampling.py:150)")
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
    p.add_argument("--wrdChrWrStyl", type=int, default=0,
                   help="model was trained with 4096-d writer-style "
                        "replacement (needs --style_dict)")
    p.add_argument("--charImages", type=int, default=0,
                   help="model was trained with per-character glyph-crop "
                        "conditioning (cli.train --charImages 1); glyphs "
                        "for the requested words are rendered exactly as "
                        "training rendered them")
    p.add_argument("--imgConditioned", type=int, default=0,
                   help="model was trained with reference-latent "
                        "conditioning (cli.train --imgConditioned 1); "
                        "needs --cond_image")
    p.add_argument("--cond_image", default="",
                   help="image whose (VAE-encoded) latent conditions "
                        "every sample in --imgConditioned mode (the "
                        "trainer's original_images=latents, "
                        "trainModifyCondition.py:733)")
    p.add_argument("--style_dict", default="",
                   help="writer->style-vector .npz from cli.train_style "
                        "(the reference's cropStyleDict_Numpy.pkl, "
                        "unet.py:1159-1161)")
    p.add_argument("--hiGanArch", type=int, default=0,
                   help="checkpoint was trained with the HiGAN+ BigGAN "
                        "generator behind the UNet signature "
                        "(cli.train --hiGanArch 1; "
                        "trainModifyConditionHiGan.py:383-389)")
    p.add_argument("--latent", type=int, default=1,
                   help="checkpoint was trained in VAE latent space "
                        "(cli.train --latent; the reference's --latent "
                        "flag, regenerateFromtrain2.py:1019). 0 loads "
                        "a pixel-space (3-channel) checkpoint and skips "
                        "the decoder")
    p.add_argument("--seed", type=int, default=0)
    return p


def pixel_space_exp(exp):
    """Pixel-space variant of a preset (cli.train --latent 0): the
    denoiser consumes/produces 3-channel images directly, no VAE."""
    import dataclasses

    return dataclasses.replace(
        exp,
        data=dataclasses.replace(exp.data, latent=False),
        unet=dataclasses.replace(exp.unet, in_channels=3, out_channels=3),
    )


def load_state(exp, ckpt_dir, model=None):
    import jax

    from ..models.unet import UNet
    from ..train.checkpoint import CheckpointManager
    from ..train.state import TrainState, make_optimizer

    model = model if model is not None else UNet(exp.unet)
    rng = jax.random.PRNGKey(0)
    if exp.data.latent:
        lat = np.zeros(
            (2, exp.data.img_height // 8, exp.data.img_width // 8, 4), np.float32
        )
    else:  # pixel mode trains on raw HxWx3 images
        lat = np.zeros((2, exp.data.img_height, exp.data.img_width, 3), np.float32)
    gh, gw = exp.unet.char_image_size
    params = model.init(
        rng, lat, np.zeros((2,), np.int32),
        np.zeros((2, exp.data.max_chars), np.int32), np.zeros((2,), np.int32),
        phosc_ids=np.zeros((2, exp.unet.phosc_dim), np.int32) if exp.unet.use_phosc else None,
        style_vec=(np.zeros((2, exp.unet.style_vec_dim), np.float32)
                   if exp.unet.style_vec_dim else None),
        char_images=(np.ones((2, exp.data.max_chars, gh, gw, 1), np.float32)
                     if exp.unet.use_char_images else None),
        cond_latents=(np.zeros_like(lat) if exp.unet.img_conditioned else None),
    )
    tx = make_optimizer(exp.train.lr)
    state = TrainState.create(params, tx)
    mgr = CheckpointManager(ckpt_dir)
    return mgr.restore(state)


def load_writers_dict(path: str, ckpt_dir: str):
    """Training-time writer-identity dict. Writer conditioning ids MUST
    come from ``writers_dict_train.json`` written at training time, not
    be rebuilt first-seen from the inference gt file — the orders differ
    whenever the regen corpus isn't the training corpus, silently
    conditioning on the wrong writers. The reference loads the training
    dict (``full_sampling.py:155-162``).

    Explicit ``--writers_dict`` wins; otherwise it is auto-discovered in
    ``<ckpt_dir>`` and its parent (training writes it to
    ``<save_path>/writers_dict_train.json`` next to ``<save_path>/ckpt``).
    Returns a WriterRegistry, or None when nothing is found.
    """
    from ..data.gt import WriterRegistry

    if path:
        if not os.path.exists(path):
            raise SystemExit(f"--writers_dict {path} not found")
        candidates = [path]
    elif ckpt_dir:
        base = os.path.abspath(ckpt_dir).rstrip("/")
        candidates = [
            os.path.join(base, "writers_dict_train.json"),
            os.path.join(os.path.dirname(base), "writers_dict_train.json"),
        ]
    else:
        candidates = []
    for c in candidates:
        if os.path.exists(c):
            logging.info("writer ids from training dict %s", c)
            return WriterRegistry.from_json(c)
    return None


def resolve_writer_registry(args_writers_dict, ckpt_dir, samples, gt_registry):
    """Training dict if available; refuses unknown writers (the
    reference would silently KeyError or misindex). Falls back to the
    gt-file first-seen registry only with a loud warning."""
    registry = load_writers_dict(args_writers_dict, ckpt_dir)
    if registry is None:
        logging.warning(
            "no writers_dict_train.json found near %r: writer ids rebuilt "
            "first-seen from the inference gt file — conditioning will NOT "
            "match training unless the corpora enumerate writers in the "
            "same order. Pass --writers_dict to pin the training mapping.",
            ckpt_dir,
        )
        return gt_registry
    unknown = sorted({s.writer for s in samples if s.writer not in registry})
    if unknown:
        raise SystemExit(
            f"{len(unknown)} writer id(s) in the gt file are not in the "
            f"training writers dict (first few: {unknown[:10]}); the model "
            f"was never conditioned on them. Remove them or sample with an "
            f"explicit --writer id."
        )
    return registry


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
    if not args.latent:
        exp = pixel_space_exp(exp)
    if args.charImages or args.imgConditioned:
        import dataclasses

        exp = dataclasses.replace(
            exp, unet=dataclasses.replace(
                exp.unet,
                use_char_images=bool(args.charImages),
                img_conditioned=bool(args.imgConditioned),
            )
        )
    if args.imgConditioned and not args.cond_image:
        raise SystemExit("--imgConditioned 1 needs --cond_image")
    style_lookup = None
    if args.wrdChrWrStyl:
        import dataclasses

        exp = dataclasses.replace(
            exp, unet=dataclasses.replace(
                exp.unet, style_vec_dim=4096,
                # match training: style REPLACES the char context
                # (reference unet.py:1616-1618)
                style_replace_context=True,
            )
        )
        if not args.style_dict:
            raise SystemExit("--wrdChrWrStyl 1 needs --style_dict (from "
                             "cli.train_style)")
        with np.load(args.style_dict, allow_pickle=False) as z:
            style_lookup = {k: z[k].astype(np.float32) for k in z.files}
    denoiser = None
    if args.hiGanArch:
        from ..models.higan import HiGanDenoiserAdapter

        denoiser = HiGanDenoiserAdapter(exp.unet)
    if args.torch_ckpt:
        if args.hiGanArch:
            raise SystemExit("--torch_ckpt conversion covers the UNet "
                             "variants only, not --hiGanArch")
        from ..models.convert import convert_reference_unet, load_torch_checkpoint

        params = convert_reference_unet(
            load_torch_checkpoint(args.torch_ckpt), exp.unet
        )
    elif args.ckpt_dir:
        state = load_state(exp, args.ckpt_dir, model=denoiser)
        params = state.ema_params if args.use_ema else state.params
    else:
        raise SystemExit("need --ckpt_dir or --torch_ckpt")

    vae, vae_params = (make_vae(exp, args.stable_dif_path, args.vae_ckpt)
                       if exp.data.latent else (None, None))
    sampler = WordSampler(exp, params, vae, vae_params, cfg_scale=args.cfg_scale,
                          ddim_steps=args.ddim, ddim_eta=args.ddim_eta,
                          model=denoiser)

    cond_lat1 = None
    if args.imgConditioned:
        from PIL import Image

        from ..utils.images import normalize_to_unit, resize_and_pad

        raw = np.asarray(Image.open(args.cond_image).convert("RGB"))
        img = normalize_to_unit(
            resize_and_pad(raw, exp.data.img_height, exp.data.img_width)
        )[None]
        if exp.data.latent:
            # SD-scaled posterior mean: the space training latents (and
            # therefore the trainer's cond_latents) live in
            from ..models.vae import encode_to_latent

            cond_lat1 = np.asarray(encode_to_latent(
                vae, vae_params, img, jax.random.PRNGKey(0), sample=False
            ))
        else:
            cond_lat1 = img.astype(np.float32)

    rng_np = np.random.default_rng(args.seed)
    if args.gt_file:
        from ..data.gt import parse_gt

        samples, gt_registry = parse_gt(args.gt_file)
        registry = resolve_writer_registry(
            args.writers_dict, args.ckpt_dir, samples, gt_registry
        )
        pairs = [(s.word, registry[s.writer], s.writer) for s in samples]
    else:
        words = [w for w in args.words.split(",") if w]
        # --writer takes the DENSE embedding index; the style dict is
        # keyed by RAW training writer ids, so invert the training
        # writers_dict when it exists (str(dense) only matches raw ids
        # for synthetic corpora, where names happen to be "0","1",...)
        registry = load_writers_dict(args.writers_dict, args.ckpt_dir)
        raw_by_dense = (
            {v: k for k, v in registry.mapping.items()} if registry else {}
        )
        pairs = []
        for w in words:
            for _ in range(args.n):
                wid = (args.writer if args.writer >= 0
                       else int(rng_np.integers(0, exp.unet.num_writers)))
                pairs.append((w, wid, raw_by_dense.get(wid, str(wid))))

    os.makedirs(args.save_path, exist_ok=True)
    rng = jax.random.PRNGKey(args.seed)
    glyph_cache: dict = {}
    B = 16
    for start in range(0, len(pairs), B):
        chunk = pairs[start : start + B]
        words_b = [w for w, _, _ in chunk]
        wids_b = [i for _, i, _ in chunk]
        phosc = None
        if exp.unet.use_phosc:
            from ..data.phosc import phosc_vector

            phosc = np.stack([
                phosc_vector(w, exp.data.phos_version, as_int=True) for w in words_b
            ]).astype(np.int32)
        style = None
        if style_lookup is not None:
            missing = [n for _, _, n in chunk if n not in style_lookup]
            if missing:
                raise SystemExit(
                    f"writers {sorted(set(missing))[:10]} not in --style_dict "
                    f"(keys: {sorted(style_lookup)[:10]}...)"
                )
            style = np.stack([style_lookup[n] for _, _, n in chunk])
        chimg = None
        if exp.unet.use_char_images:
            from ..data.dataset import char_glyphs

            chimg = np.stack([
                char_glyphs(w, exp.data.max_chars, exp.unet.char_image_size,
                            glyph_cache)
                for w in words_b
            ])
        wids2 = mix = None
        if args.writer2 >= 0:
            # writer-style interpolation (reference --interpolation:
            # embeddings mixed inside the forward, sampling.py:122-124);
            # default draws a fresh uniform(0,1) per sample like the
            # reference gt-file sampler (full_sampling.py:150)
            wids2 = [args.writer2] * len(chunk)
            mix = (
                np.full((len(chunk),), args.mix_rate, np.float32)
                if args.mix_rate >= 0
                else rng_np.uniform(0.0, 1.0, len(chunk)).astype(np.float32)
            )
        condlat = (np.repeat(cond_lat1, len(chunk), axis=0)
                   if cond_lat1 is not None else None)
        imgs = sampler.sample(words_b, wids_b, jax.random.fold_in(rng, start),
                              phosc, writer_ids2=wids2, mix_rate=mix,
                              style_vec=style, char_images=chimg,
                              cond_latents=condlat)
        names = [
            f"{start+i:05d}_{wid}_{w}"
            + (f"_mix{mix[i]:.3f}" if mix is not None else "")
            + ".png"
            for i, (w, wid, _) in enumerate(chunk)
        ]
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
