"""Writer-style encoder trainer (the in-repo replacement for the
reference's DiffusionPen-style triplet-trained extractor,
``feature_extractor.py:30-37``, whose weights fed the
``cropStyleDict_Numpy.pkl`` style dict, ``unet.py:1159-1161``).

Trains :class:`models.style.StyleEncoder` with a writer-identity
triplet loss (anchor/positive same writer, negative different writer),
then builds and saves the writer->4096-d style dict consumed by
``cli.train --wrdChrWrStyl 1 --style_dict <npz>``. Reports
nearest-centroid writer-retrieval accuracy as the training metric.
"""

from __future__ import annotations

import argparse
import csv
import logging
import os
import pickle

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="writer-style encoder trainer")
    p.add_argument("--gt_train", default="", help="annotation file (real data)")
    p.add_argument("--image_dir", default="")
    p.add_argument("--synthetic", type=int, default=0,
                   help="writer-styled synthetic renders")
    p.add_argument("--writers", type=int, default=16, help="synthetic writers")
    p.add_argument("--samples_per_writer", type=int, default=24)
    p.add_argument("--img_size", default="64,256")
    p.add_argument("--out_dim", type=int, default=4096,
                   help="style vector size (UNet wrd_proj expects 4096)")
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch_size", type=int, default=16, help="triplets/step")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--margin", type=float, default=0.2)
    p.add_argument("--save_dir", default="./runs/style")
    p.add_argument("--seed", type=int, default=0)
    return p


def _corpus(args) -> dict[str, list[np.ndarray]]:
    """writer -> list of [-1,1] float32 HWC crops."""
    h, w = (int(v) for v in args.img_size.split(","))
    from ..data.native import batch_normalize

    by_writer: dict[str, list[np.ndarray]] = {}
    if args.synthetic or not args.gt_train:
        from ..data.synthetic import render_word, stable_seed, word_list, writer_style

        words = word_list(max(10, args.samples_per_writer))
        for wi in range(args.writers):
            wid = str(wi)
            style = writer_style(wid)
            crops = []
            for k in range(args.samples_per_writer):
                word = words[k % len(words)]
                crops.append(render_word(
                    word, h, w, seed=stable_seed(f"{wid}|{k}"), style=style,
                ))
            by_writer[wid] = list(batch_normalize(np.stack(crops)))
    else:
        from PIL import Image

        from ..data.gt import parse_gt
        from ..utils.images import resize_and_pad

        samples, _ = parse_gt(args.gt_train)
        for s in samples:
            p = os.path.join(args.image_dir, s.image) if args.image_dir else ""
            if not (p and os.path.exists(p)):
                continue
            arr = resize_and_pad(np.asarray(Image.open(p).convert("RGB")), h, w)
            by_writer.setdefault(s.writer, []).append(batch_normalize(arr))
    return {k: v for k, v in by_writer.items() if len(v) >= 2}


def _retrieval_accuracy(vecs_by_writer: dict[str, np.ndarray]) -> float:
    """Leave-one-out nearest-centroid writer identification over the
    encoded corpus (the style dict is the centroid per writer)."""
    writers = sorted(vecs_by_writer)
    correct = total = 0
    sums = {w: vecs_by_writer[w].sum(axis=0) for w in writers}
    counts = {w: len(vecs_by_writer[w]) for w in writers}
    for w in writers:
        for v in vecs_by_writer[w]:
            cents = np.stack([
                (sums[u] - (v if u == w else 0))
                / (counts[u] - (1 if u == w else 0) or 1)
                for u in writers
            ])
            cents = cents / (np.linalg.norm(cents, axis=-1, keepdims=True) + 1e-8)
            vn = v / (np.linalg.norm(v) + 1e-8)
            total += 1
            correct += writers[int((cents @ vn).argmax())] == w
    return correct / max(total, 1)


def main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from ..models.style import StyleEncoder, triplet_loss

    os.makedirs(args.save_dir, exist_ok=True)
    by_writer = _corpus(args)
    writers = sorted(by_writer)
    if len(writers) < 2:
        raise SystemExit("need at least 2 writers with >=2 crops each")
    logging.info("%d writers, %d crops total", len(writers),
                 sum(len(v) for v in by_writer.values()))

    h, w = (int(v) for v in args.img_size.split(","))
    enc = StyleEncoder(out_dim=args.out_dim)
    rng = jax.random.PRNGKey(args.seed)
    params = enc.init(rng, np.zeros((1, h, w, 3), np.float32))
    tx = optax.adamw(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, anchor, positive, negative):
        def loss_fn(p):
            a = enc.apply(p, anchor)
            pos = enc.apply(p, positive)
            neg = enc.apply(p, negative)
            return triplet_loss(a, pos, neg, args.margin)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    encode = jax.jit(lambda p, x: enc.apply(p, x))

    def encode_corpus(p) -> dict[str, np.ndarray]:
        # whole writer stacks at once (one compile per distinct count)
        return {
            wid: np.asarray(encode(p, jnp.asarray(np.stack(crops))))
            for wid, crops in by_writer.items()
        }

    np_rng = np.random.default_rng(args.seed)
    steps_per_epoch = max(
        1, sum(len(v) for v in by_writer.values()) // args.batch_size
    )
    log_path = os.path.join(args.save_dir, "log.csv")
    with open(log_path, "a", newline="") as f:
        csv.writer(f).writerow(["epoch", "loss", "retrieval_acc"])
    best_acc = -1.0
    for epoch in range(args.epochs):
        losses = []
        for _ in range(steps_per_epoch):
            anc, pos, neg = [], [], []
            for _ in range(args.batch_size):
                wa, wn = np_rng.choice(len(writers), 2, replace=False)
                ca = by_writer[writers[wa]]
                i, j = np_rng.choice(len(ca), 2, replace=False)
                cn = by_writer[writers[wn]]
                anc.append(ca[i])
                pos.append(ca[j])
                neg.append(cn[np_rng.integers(len(cn))])
            params, opt_state, loss = train_step(
                params, opt_state,
                jnp.asarray(np.stack(anc)), jnp.asarray(np.stack(pos)),
                jnp.asarray(np.stack(neg)),
            )
            losses.append(float(loss))
        acc = _retrieval_accuracy(encode_corpus(params))
        mean_loss = float(np.mean(losses))
        logging.info("epoch %d triplet %.4f retrieval %.3f", epoch, mean_loss, acc)
        with open(log_path, "a", newline="") as f:
            csv.writer(f).writerow([epoch, mean_loss, acc])
        if acc > best_acc:
            best_acc = acc
            # atomic: a reader (or a kill) must never see a half-written pickle
            tmp = os.path.join(args.save_dir, "best_params.pkl.tmp")
            with open(tmp, "wb") as f:
                pickle.dump(jax.tree_util.tree_map(np.asarray, params), f)
            os.replace(tmp, os.path.join(args.save_dir, "best_params.pkl"))

    # writer->vector dict with the best weights; --style_dict format
    with open(os.path.join(args.save_dir, "best_params.pkl"), "rb") as f:
        params = pickle.load(f)
    vecs = encode_corpus(params)
    style_dict = {wid: v.mean(axis=0).astype(np.float32) for wid, v in vecs.items()}
    np.savez(os.path.join(args.save_dir, "style_dict.npz"), **style_dict)
    logging.info(
        "style dict (%d writers, %d-d) -> %s ; best retrieval %.3f",
        len(style_dict), args.out_dim,
        os.path.join(args.save_dir, "style_dict.npz"), best_acc,
    )


if __name__ == "__main__":
    main()
