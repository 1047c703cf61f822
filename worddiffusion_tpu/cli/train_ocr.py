"""CTC OCR recognizer trainer — produces the frozen recognizer used by
the regeneration accept/reject filter (the reference loads pretrained
HTRNet weights from the author's cluster,
``regenerateFromtrain2.py:1121``; here the recognizer is trainable
in-repo).

  python -m worddiffusion_tpu.cli.train_ocr --synthetic 1 --epochs 5 \
      --save_dir ./runs/ocr
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np


def main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    p = argparse.ArgumentParser()
    p.add_argument("--gt_train", default="")
    p.add_argument("--image_dir", default="")
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--save_dir", default="./runs/ocr")
    p.add_argument("--lang", default="eng", choices=["eng", "nor", "cvl"])
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--vocab_size", type=int, default=100,
                   help="synthetic mode: number of distinct words")
    p.add_argument("--samples_per_word", type=int, default=32)
    p.add_argument("--eval_renders", type=int, default=4,
                   help="held-out renders per vocab word (unseen seeds)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax
    import orbax.checkpoint as ocp

    from ..data.alphabets import (
        OCR_CVL, OCR_CVL_BLANK, OCR_ENG, OCR_ENG_BLANK, OCR_NOR, OCR_NOR_BLANK,
    )
    from ..data.gt import parse_gt
    from ..data.synthetic import render_word, stable_seed, synthetic_corpus
    from ..ops.ctc import collapse_and_decode, ctc_loss, encode_ocr_labels, greedy_frame_ids
    from ..models.ocr import CTCRecognizer
    from ..utils.images import normalize_to_unit, resize_and_pad

    alphabet, blank = {
        "eng": (OCR_ENG, OCR_ENG_BLANK),
        "nor": (OCR_NOR, OCR_NOR_BLANK),
        "cvl": (OCR_CVL, OCR_CVL_BLANK),
    }[args.lang]

    if args.synthetic or not args.gt_train:
        from ..data.synthetic import word_list

        samples = synthetic_corpus(
            words=word_list(args.vocab_size, lang=args.lang),
            samples_per_word=args.samples_per_word,
        )
    else:
        samples, _ = parse_gt(args.gt_train)

    def load(s):
        import os as _os

        from PIL import Image

        path = _os.path.join(args.image_dir, s.image) if args.image_dir else ""
        if path and _os.path.exists(path):
            arr = np.asarray(Image.open(path).convert("L"))[..., None]
        else:
            arr = render_word(s.word, 64, 256, seed=stable_seed(s.image))[..., :1]
        return normalize_to_unit(resize_and_pad(arr, 64, 256))

    model = CTCRecognizer(num_classes=len(alphabet))
    rng = jax.random.PRNGKey(args.seed)
    params = model.init(rng, np.zeros((1, 64, 256, 1), np.float32))
    # CTC gradients spike early; clip keeps bf16 training NaN-free
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(args.lr))
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, imgs, labels, lens, drng):
        def loss_fn(p):
            logits = model.apply(p, imgs, deterministic=False,
                                 rngs={"dropout": drng})
            return jnp.mean(ctc_loss(logits, labels, lens, blank_id=blank))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    # held-out evaluation set: same vocabulary, unseen render seeds
    # (synthetic jitter makes each seed a distinct image) — a genuine
    # read-back test, not a training-batch echo
    eval_words = sorted({s.word for s in samples})
    eval_imgs, eval_targets = [], []
    for w in eval_words:
        for j in range(args.eval_renders):
            arr = render_word(w, 64, 256, seed=10_000_000 + stable_seed(f"{w}|{j}") % 2**20)
            eval_imgs.append(normalize_to_unit(arr[..., :1]))
            eval_targets.append(w)
    eval_imgs = np.stack(eval_imgs)

    eval_apply = jax.jit(lambda p, x: model.apply(p, x))

    def heldout_exact_match(params) -> float:
        hits = 0
        bs = 128
        pad = (-len(eval_imgs)) % bs
        imgs_padded = np.concatenate([eval_imgs, eval_imgs[:pad]]) if pad else eval_imgs
        decoded: list[str] = []
        for start in range(0, len(imgs_padded), bs):
            logits = eval_apply(params, jnp.asarray(imgs_padded[start : start + bs]))
            decoded.extend(collapse_and_decode(np.asarray(greedy_frame_ids(logits)), alphabet))
        decoded = decoded[: len(eval_targets)]
        hits = sum(d == t for d, t in zip(decoded, eval_targets))
        return hits / len(eval_targets)

    np_rng = np.random.default_rng(args.seed)
    os.makedirs(args.save_dir, exist_ok=True)
    mgr = ocp.CheckpointManager(
        os.path.abspath(os.path.join(args.save_dir, "ckpt")),
        options=ocp.CheckpointManagerOptions(max_to_keep=2, create=True),
    )
    gstep = 0
    for epoch in range(args.epochs):
        order = np_rng.permutation(len(samples))
        losses = []
        for start in range(0, len(samples) - args.batch_size + 1, args.batch_size):
            batch = [samples[i] for i in order[start : start + args.batch_size]]
            imgs = jnp.asarray(np.stack([load(s) for s in batch]))
            labels, lens = encode_ocr_labels([s.word for s in batch], alphabet, 42)
            params, opt, loss = step(
                params, opt, imgs, jnp.asarray(labels), jnp.asarray(lens),
                jax.random.fold_in(rng, gstep),
            )
            losses.append(float(loss))
            gstep += 1
        acc = heldout_exact_match(params)
        logging.info("epoch %d loss %.4f held-out exact-match %.3f (%d imgs)",
                     epoch, float(np.mean(losses)), acc, len(eval_targets))
        mgr.save(gstep, args=ocp.args.StandardSave(params))
    mgr.wait_until_finished()
    import json

    with open(os.path.join(args.save_dir, "metrics.json"), "w") as f:
        json.dump(
            {
                "heldout_exact_match": acc,
                "eval_images": len(eval_targets),
                "vocab_size": len(eval_words),
                "epochs": args.epochs,
                "train_samples": len(samples),
            },
            f,
        )
    logging.info("saved OCR recognizer to %s/ckpt (held-out %.3f)",
                 args.save_dir, acc)


if __name__ == "__main__":
    main()
