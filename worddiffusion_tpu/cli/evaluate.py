"""Evaluation CLI: FID + OCR exact-match + PHOSC-ZSL over a directory
of generated word images vs a real set — the quality gates the
reference logs informally (SURVEY.md §6: OCR accept rate, PHOSC ZSL).

  python -m worddiffusion_tpu.cli.evaluate \
      --real_dir ./crops --fake_dir ./regen \
      [--ocr_ckpt ./runs/ocr/ckpt] [--phosc_params ./runs/phosc/best_params.pkl]
"""

from __future__ import annotations

import argparse
import json
import logging
import os

import numpy as np


def _load_dir(path: str, height: int, width: int, limit: int = 0):
    """Images + the word parsed from the regen filename
    ``{img}_{writer}_{word}.png`` (falls back to stem)."""
    from PIL import Image

    from ..utils.images import normalize_to_unit, resize_and_pad

    names = sorted(
        f for f in os.listdir(path) if f.lower().endswith((".png", ".jpg"))
    )
    if limit:
        names = names[:limit]
    imgs, words = [], []
    for n in names:
        arr = np.asarray(Image.open(os.path.join(path, n)).convert("RGB"))
        imgs.append(normalize_to_unit(resize_and_pad(arr, height, width)))
        stem = os.path.splitext(n)[0]
        words.append(stem.rsplit("_", 1)[-1] if "_" in stem else stem)
    return np.stack(imgs) if imgs else np.zeros((0, height, width, 3), np.float32), words


def main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    p = argparse.ArgumentParser()
    p.add_argument("--real_dir", required=True)
    p.add_argument("--fake_dir", required=True)
    p.add_argument("--height", type=int, default=64)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--ocr_ckpt", default="")
    p.add_argument("--phosc_params", default="",
                   help="best_params.pkl from cli.train_phosc; enables the "
                        "default PHOSC-feature FID + ZSL accuracy")
    p.add_argument("--phosc_trunk", default="vgg")
    p.add_argument("--inception_weights", default="",
                   help="torchvision inception_v3 state dict (.pt/.npz); "
                        "enables classic Inception FID")
    p.add_argument("--language", default="eng")
    p.add_argument("--out", default="", help="write results json here")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..data.alphabets import OCR_CVL, OCR_ENG, OCR_NOR
    from ..eval.fid import compute_features, fid_score, load_phosc_net, phosc_resize
    from ..models.style import StyleEncoder

    real, real_words = _load_dir(args.real_dir, args.height, args.width, args.limit)
    fake, fake_words = _load_dir(args.fake_dir, args.height, args.width, args.limit)
    logging.info("loaded %d real / %d generated", len(real), len(fake))
    results = {}

    rng = jax.random.PRNGKey(0)

    def batches(arr, as_jax=True):
        for s in range(0, len(arr), args.batch_size):
            chunk = arr[s : s + args.batch_size]
            yield jnp.asarray(chunk) if as_jax else chunk

    # one pickle load + one compiled program serves BOTH fid_phosc and
    # the ZSL accuracy below
    phosc_fn = None
    if args.phosc_params:
        if not os.path.exists(args.phosc_params):
            raise SystemExit(f"--phosc_params {args.phosc_params} not found")
        phosc_fn, _ = load_phosc_net(
            args.phosc_params, args.language, args.phosc_trunk
        )

    # FID featurizer preference: Inception (classic FID, weights on
    # disk) > trained PHOSCNet trunk (default protocol here) > random
    # StyleEncoder (relative-only, warned). See eval/fid.py.
    if len(real) > 1 and len(fake) > 1:
        if args.inception_weights:
            if not os.path.exists(args.inception_weights):
                raise SystemExit(
                    f"--inception_weights {args.inception_weights} not found"
                )
            from ..eval.inception import load_inception_featurizer

            feat_fn = load_inception_featurizer(args.inception_weights)
            rf = compute_features(feat_fn, batches(real))
            ff = compute_features(feat_fn, batches(fake))
            results["fid_inception"] = fid_score(rf, ff)
        if phosc_fn is not None:
            feat_fn = lambda im: np.asarray(
                phosc_fn(jnp.asarray(phosc_resize(im)))["features"]
            )
            rf = compute_features(feat_fn, batches(real, as_jax=False))
            ff = compute_features(feat_fn, batches(fake, as_jax=False))
            results["fid_phosc"] = fid_score(rf, ff)
        if not results:
            logging.warning(
                "no --inception_weights / --phosc_params: FID uses a "
                "RANDOM-INIT StyleEncoder (relative comparisons only)"
            )
            enc = StyleEncoder(dtype="float32")
            enc_params = enc.init(
                rng, real[:1] if len(real) else np.zeros((1, 64, 256, 3), np.float32)
            )
            feat_fn = jax.jit(lambda im: enc.apply(enc_params, im))
            rf = compute_features(feat_fn, batches(real))
            ff = compute_features(feat_fn, batches(fake))
            results["fid_style_encoder"] = fid_score(rf, ff)

    if args.ocr_ckpt:
        import orbax.checkpoint as ocp

        from ..models.ocr import CTCRecognizer
        from ..ops.ctc import collapse_and_decode, greedy_frame_ids

        # alphabet follows --language (the nor/cvl OCR checkpoints have
        # extended classes; restoring one into an eng-shaped net fails,
        # and eng decode could never emit the extended glyphs)
        alphabet = {"nor": OCR_NOR, "cvl": OCR_CVL}.get(args.language, OCR_ENG)
        ocr = CTCRecognizer(num_classes=len(alphabet))
        ocr_vars = ocr.init(rng, np.zeros((1, args.height, args.width, 1), np.float32))
        mgr = ocp.CheckpointManager(os.path.abspath(args.ocr_ckpt))
        ocr_vars = mgr.restore(mgr.latest_step(), args=ocp.args.StandardRestore(ocr_vars))
        ocr_fn = jax.jit(lambda im: ocr.apply(ocr_vars, im))
        hits = 0
        for s in range(0, len(fake), args.batch_size):
            chunk = fake[s : s + args.batch_size]
            logits = ocr_fn(jnp.asarray(chunk[..., :1]))
            decoded = collapse_and_decode(np.asarray(greedy_frame_ids(logits)), alphabet)
            hits += sum(d == w for d, w in zip(decoded, fake_words[s : s + len(chunk)]))
        results["ocr_exact_match"] = hits / max(len(fake), 1)

    if phosc_fn is not None:
        from ..data.phosc import phosc_vector
        from ..eval.zsl import zsl_accuracy

        # Distinguish "this language has no PHOS tables" (e.g. cvl —
        # true in the reference too) from "no embeddable words": probe
        # the version itself first and report it by name.
        try:
            phosc_vector("a", args.language)
            version_ok = True
        except KeyError:
            version_ok = False
            results["phosc_zsl_note"] = (
                f"no PHOS tables for language '{args.language}'; ZSL skipped"
            )

        # Filename-derived words are only usable for ZSL when every
        # character has a PHOS entry — comparison sets of bare real
        # renders (e.g. the FID noise-floor halves, named syn-00000.png)
        # have no word suffix, so the metric is skipped for them rather
        # than crashing on the fake "word". Memoised per unique word.
        _cache: dict[str, bool] = {}

        def _embeddable(w: str) -> bool:
            if w not in _cache:
                try:
                    phosc_vector(w, args.language)
                    _cache[w] = True
                except KeyError:
                    _cache[w] = False
            return _cache[w]

        keep = (
            [i for i, w in enumerate(fake_words) if _embeddable(w)]
            if version_ok else []
        )
        if keep:
            vfake = fake[keep]
            vwords = [fake_words[i] for i in keep]

            def phosc_batches():
                for s in range(0, len(vfake), args.batch_size):
                    chunk = vfake[s : s + args.batch_size]
                    yield phosc_resize(chunk), vwords[s : s + len(chunk)]

            acc, by_len = zsl_accuracy(
                lambda im: phosc_fn(jnp.asarray(im)), phosc_batches(),
                list(dict.fromkeys(vwords)), args.language,
            )
            results["phosc_zsl_accuracy"] = acc
            if len(keep) < len(fake_words):
                results["phosc_zsl_n"] = len(keep)
        elif version_ok:
            results["phosc_zsl_note"] = (
                "no PHOS-embeddable filename words; ZSL skipped"
            )

    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f)


if __name__ == "__main__":
    main()
