"""Regeneration CLI (``regenerateFromtrain2.py`` equivalent):
OCR-filtered, resumable dataset regeneration."""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="worddiffusion-tpu regeneration")
    p.add_argument("--preset", default="iam")
    p.add_argument("--ckpt_dir", required=True)
    p.add_argument("--gt_file", required=True)
    p.add_argument("--writers_dict", default="",
                   help="writers_dict_train.json from training; default: "
                        "auto-discover next to --ckpt_dir")
    p.add_argument("--dump_path", default="./regen")
    p.add_argument("--prior_dump_paths", default="",
                   help="comma-separated previous dump folders (globs ok): "
                        "crops already present there are skipped, like the "
                        "reference's dump-folder history "
                        "(regenerateFromtrain2.py:676-704)")
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--fullSampling", type=int, default=0,
                   help="1: full 599 model calls; 0: skip-step schedule")
    p.add_argument("--ddim", type=int, default=0,
                   help="beyond-reference: DDIM with N steps instead of "
                        "the DDPM schedules (fastest regen mode)")
    p.add_argument("--keep_rejected", type=int, default=0,
                   help="also write OCR-rejected images under "
                        "<dump_path>/rejected")
    p.add_argument("--epoch", type=int, default=0, help="skip-schedule epoch knob")
    p.add_argument("--sidChange", type=int, default=0)
    p.add_argument("--ocr_ckpt", default="", help="orbax dir of a trained CTCRecognizer")
    p.add_argument("--no_ocr_filter", type=int, default=0)
    p.add_argument("--use_ema", type=int, default=1)
    p.add_argument("--stable_dif_path", default="")
    p.add_argument("--vae_ckpt", default="",
                   help="orbax dir from cli.train_vae (in-repo codec)")
    p.add_argument("--flagGen", default="", help="stop-flag file")
    p.add_argument("--hiGanArch", type=int, default=0,
                   help="checkpoint was trained with the HiGAN+ BigGAN "
                        "generator behind the UNet signature "
                        "(cli.train --hiGanArch 1)")
    p.add_argument("--latent", type=int, default=1,
                   help="checkpoint was trained in VAE latent space "
                        "(cli.train --latent; the reference's --latent "
                        "flag, regenerateFromtrain2.py:1019)")
    p.add_argument("--partialLoad", type=float, default=0.0)
    p.add_argument("--max_batches", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    args = build_parser().parse_args(argv)

    from ..parallel.distributed import initialize_multihost

    initialize_multihost()  # before any backend use; no-op single-process

    import jax

    from ..configs import presets
    from ..data.alphabets import OCR_CVL, OCR_ENG, OCR_NOR
    from ..data.gt import parse_gt
    from ..diffusion.sampler import regen_call_mask
    from ..generate.regenerate import Regenerator
    from ..generate.sample import WordSampler
    from ..models.ocr import CTCRecognizer
    from .sample import load_state, make_vae, pixel_space_exp, resolve_writer_registry

    exp = presets.get(args.preset)
    if not args.latent:
        exp = pixel_space_exp(exp)
    denoiser = None
    if args.hiGanArch:
        from ..models.higan import HiGanDenoiserAdapter

        denoiser = HiGanDenoiserAdapter(exp.unet)
    state = load_state(exp, args.ckpt_dir, model=denoiser)
    params = state.ema_params if args.use_ema else state.params
    vae, vae_params = (make_vae(exp, args.stable_dif_path, args.vae_ckpt)
                       if exp.data.latent else (None, None))

    mask = regen_call_mask(
        exp.diffusion.num_steps, epoch=args.epoch,
        full_sampling=bool(args.fullSampling),
    )
    # reference logs its `modelCall` counter (regenerateFromtrain2.py:642)
    if args.ddim:
        logging.info("denoiser calls per batch: %d (DDIM)", args.ddim)
    else:
        logging.info(
            "denoiser calls per batch: %d of %d steps",
            int(mask[1:].sum()), exp.diffusion.num_steps - 1,
        )
    mesh = None
    if jax.device_count() > 1:
        from ..configs.config import MeshConfig
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(MeshConfig(data=-1, model=1))
        logging.info("sampling sharded over %d chips", mesh.shape["data"])
    # OCR alphabet follows the preset's tokenizer alphabet (the
    # reference's Norwegian regen uses the extended-alphabet HTRNet,
    # regenerateFromTrainNor.py:1064-1066; for CVL we go beyond the
    # reference, whose gate keeps plain-English classes and so can
    # never accept digit/punctuation words —
    # regenerateFromtrainWord22CVL.py:106)
    ocr_alphabet = {"nor": OCR_NOR, "cvl": OCR_CVL}.get(
        exp.data.alphabet, OCR_ENG
    )
    ocr_apply = None
    if not args.no_ocr_filter:
        ocr = CTCRecognizer(num_classes=len(ocr_alphabet))
        rng = jax.random.PRNGKey(0)
        ocr_vars = ocr.init(
            rng, np.zeros((1, exp.data.img_height, exp.data.img_width, 1), np.float32)
        )
        if args.ocr_ckpt:
            import orbax.checkpoint as ocp

            mgr = ocp.CheckpointManager(os.path.abspath(args.ocr_ckpt))
            step = mgr.latest_step()
            ocr_vars = mgr.restore(step, args=ocp.args.StandardRestore(ocr_vars))
        else:
            logging.warning(
                "no --ocr_ckpt: OCR filter uses an UNTRAINED recognizer "
                "(accept rate ~0); pass --no_ocr_filter 1 to keep all images"
            )
        ocr_apply = jax.jit(lambda imgs: ocr.apply(ocr_vars, imgs))

    # OCR fused at sampler CONSTRUCTION (only uint8 images + int
    # frame-ids cross the device->host link); the Regenerator never
    # mutates a sampler it didn't build
    sampler = WordSampler(
        exp, params, vae, vae_params,
        call_mask=None if args.ddim else mask,
        stochastic=bool(args.fullSampling),
        ddim_steps=args.ddim,
        mesh=mesh,
        ocr_apply=ocr_apply,
        model=denoiser,
    )

    samples, gt_registry = parse_gt(args.gt_file, partial_load=args.partialLoad)
    registry = resolve_writer_registry(
        args.writers_dict, args.ckpt_dir, samples, gt_registry
    )
    # multi-host regeneration: each process generates a disjoint slice
    # of the corpus (the filename-based resume scan keeps them disjoint
    # even on shared storage)
    from ..data.loader import host_shard

    if jax.process_count() > 1:
        pid, pcount = jax.process_index(), jax.process_count()
        samples = host_shard(samples, pid, pcount)
        logging.info("multi-host regen: process %d/%d, %d samples local",
                     pid, pcount, len(samples))
    regen = Regenerator(
        sampler,
        ocr_apply=ocr_apply,
        ocr_alphabet=ocr_alphabet,
        out_dir=args.dump_path,
        writer_lookup=lambda w: registry[w],
        sid_change=args.sidChange,
        stop_flag=args.flagGen or None,
        keep_rejected=bool(args.keep_rejected),
        prior_dirs=[d.strip() for d in args.prior_dump_paths.split(",") if d.strip()],
    )
    stats = regen.run(
        samples,
        batch_size=args.batch_size,
        rng=jax.random.PRNGKey(args.seed),
        max_batches=args.max_batches or None,
    )
    logging.info(
        "accept rate %.3f (%d/%d), %d skipped as existing",
        stats.accept_rate, stats.accepted, stats.generated, stats.skipped_existing,
    )


if __name__ == "__main__":
    main()
