"""Character-counter trainer/tester (``main_charactercounter.py``
equivalent): CNN classifying word length 1..17 from the word image."""

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
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--outputs", type=int, default=17)
    p.add_argument("--save_dir", default="./runs/charcounter")
    p.add_argument("--balance", type=int, default=0,
                   help="balance samples per word length (augment_dataset_for_charactercounter)")
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--samples_per_word", type=int, default=16,
                   help="synthetic mode: renders per vocabulary word")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from ..data.gt import parse_gt
    from ..data.manipulate import balance_by_length
    from ..data.synthetic import render_word, stable_seed, synthetic_corpus
    from ..models.charcounter import CharacterCounterNet, counter_loss, length_onehot
    from ..utils.images import normalize_to_unit, resize_and_pad

    if args.synthetic or not args.gt_train:
        samples = synthetic_corpus(samples_per_word=args.samples_per_word)
    else:
        samples, _ = parse_gt(args.gt_train)
    if args.balance:
        samples = balance_by_length(samples, args.balance, args.seed)

    def load(s):
        from PIL import Image

        path = os.path.join(args.image_dir, s.image) if args.image_dir else ""
        if path and os.path.exists(path):
            arr = np.asarray(Image.open(path).convert("RGB"))
        else:
            arr = render_word(s.word, 50, 250, seed=stable_seed(s.image))
        return normalize_to_unit(resize_and_pad(arr, 50, 250))

    model = CharacterCounterNet(outputs=args.outputs)
    rng = jax.random.PRNGKey(args.seed)
    params = model.init(rng, np.zeros((1, 50, 250, 3), np.float32))
    tx = optax.adam(args.lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, imgs, onehot):
        def loss_fn(p):
            return counter_loss(model.apply(p, imgs), onehot)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    np_rng = np.random.default_rng(args.seed)
    os.makedirs(args.save_dir, exist_ok=True)
    for epoch in range(args.epochs):
        order = np_rng.permutation(len(samples))
        losses, correct, total = [], 0, 0
        for start in range(0, len(samples) - args.batch_size + 1, args.batch_size):
            batch = [samples[i] for i in order[start : start + args.batch_size]]
            imgs = jnp.asarray(np.stack([load(s) for s in batch]))
            onehot = length_onehot([s.word for s in batch], args.outputs)
            params, opt, loss = step(params, opt, imgs, onehot)
            losses.append(float(loss))
            pred = np.asarray(jnp.argmax(model.apply(params, imgs), -1))
            correct += int((pred == np.asarray(jnp.argmax(onehot, -1))).sum())
            total += len(batch)
        logging.info("epoch %d loss %.4f len-acc %.3f", epoch,
                     float(np.mean(losses)), correct / max(total, 1))
    import pickle

    with open(os.path.join(args.save_dir, "params.pkl"), "wb") as f:
        pickle.dump(jax.tree_util.tree_map(np.asarray, params), f)
    logging.info("saved to %s", args.save_dir)


if __name__ == "__main__":
    main()
