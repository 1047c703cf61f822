"""PHOSC recognizer train/test CLI (``ResPhoSCNetZSL/main.py``
equivalent): AdamW + reduce-on-plateau, per-epoch ZSL validation,
best-checkpoint retention, csv log, ZSL/GZSL testing, stop-flag."""

from __future__ import annotations

import argparse
import csv
import logging
import os

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="PHOSC recognizer trainer")
    p.add_argument("--mode", default="train", choices=["train", "test"])
    p.add_argument("--model", default="vgg", choices=["vgg", "resnet18"])
    p.add_argument("--train_csv", default="", help="gt file (any supported format)")
    p.add_argument("--valid_csv", default="")
    p.add_argument("--test_csv", default="")
    p.add_argument("--image_dir", default="")
    p.add_argument("--phos_size", type=int, default=165)   # main.py:65
    p.add_argument("--phoc_size", type=int, default=604)   # main.py:66
    p.add_argument("--language", default="eng", choices=["eng", "gw", "nor"])
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--save_dir", default="./runs/phosc")
    p.add_argument("--flagFile", default="")
    p.add_argument("--prompt", type=int, default=0, help="visual prompt tuning")
    p.add_argument("--plateau", type=int, default=1,
                   help="0: plain AdamW (no reduce-on-plateau)")
    p.add_argument("--plateau_patience", type=int, default=5,
                   help="reduce-on-plateau patience in EPOCHS (reference "
                        "ReduceLROnPlateau patience=5, main.py:267-268). "
                        "Larger vocabularies learn slower early and can "
                        "trip the default before the first real gains "
                        "(round-5 syn5 log); raise it for those runs.")
    p.add_argument("--n_synth", type=int, default=200,
                   help="synthetic mode: training-set size")
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--renders_per_word", type=int, default=8,
                   help="synthetic mode: renders per vocabulary word")
    p.add_argument("--augment", type=int, default=0,
                   help="train-time augmentation probability in percent "
                        "(reference dataset_manipulation/augmentation.py ops)")
    p.add_argument("--writer_styles", type=int, default=0,
                   help="synthetic mode: render each sample with its "
                        "writer's consistent style (slant/weight/size)")
    p.add_argument("--len_counter", default="",
                   help="test mode: charcounter params.pkl — adds the "
                        "length-estimation evaluation (the reference's "
                        "gzslAccuracyTestAni lenEstimation path, "
                        "engine.py:273-461; its 'len_vec_sigmoid' head "
                        "exists in NO shipped reference model, so the "
                        "trained charactercounter supplies the length "
                        "vector here)")
    p.add_argument("--counter_outputs", type=int, default=17)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--gamma_points", type=int, default=51,
                   help="test mode: points on the [0, 0.5] GZSL margin "
                        "grid swept for calibrated stacking and the "
                        "valmargin choice (51 = 0.01 steps)")
    p.add_argument("--calib_words_fraction", type=float, default=0.0,
                   help="hold this fraction of the TRAIN vocabulary out of "
                        "training as a genuine unseen calibration split "
                        "(calib_words.json); --mode test uses it to choose "
                        "the GZSL seen-class margin without touching test "
                        "data (gzsl_valmargin_* rows)")
    return p


def _load_split(path, image_dir, synthetic, language, n_synth=200, split="train",
                renders_per_word=8):
    """Synthetic mode builds a genuine zero-shot split: the first 80% of
    the vocabulary trains, the last 20% (words never seen in training)
    validates/tests — matching the seen/unseen protocol of the
    reference (``split_to_seen_and_unseen.py``). The vocabulary size is
    tied to ``n_synth`` (at 8 renders/word) so the same ``--n_synth``
    keeps the same seen/unseen word cut when ``--renders_per_word``
    changes — only training-set *density* moves."""
    from ..data.gt import parse_gt
    from ..data.synthetic import synthetic_corpus, word_list

    if synthetic or not path:
        vocab = word_list(max(10, n_synth // 8), language)
        cut = max(1, int(len(vocab) * 0.8))
        words = vocab[:cut] if split == "train" else vocab[cut:]
        per_word = renders_per_word if split == "train" else 8
        samples = synthetic_corpus(words=words, samples_per_word=per_word)
        if split == "train":
            # cap scales WITH density so the last seen words never lose
            # all their renders when renders_per_word isn't a multiple
            # of 8 (the corpus is word-major)
            samples = samples[: n_synth * renders_per_word // 8]
    else:
        samples, _ = parse_gt(path)
    return samples


# key (image, word): split image names can collide. Bounded: on a real
# corpus (100k+ IAM crops at 50x250x3 each) an unbounded cache grows to
# multiple GB; past the cap we evict oldest-inserted (dict order).
_RENDER_CACHE: dict = {}
_RENDER_CACHE_CAP = 20_000  # ~2.8 GB of uint8 50x250x3 worst case


def _image_batches(samples, image_dir, batch_size, rng=None,
                   augment_pct=0, writer_styles=False, drop_remainder=True):
    """yield (images [B,50,250,3] **uint8**, words).

    ``drop_remainder=False`` (every EVAL call site) also yields the
    final partial batch — dropping it silently evaluates on zero
    samples whenever a corpus is smaller than ``batch_size`` (the
    default synthetic valid split is 40 images at batch 64).

    uint8 all the way to the device: the axon host->device link runs
    ~50 MB/s, so shipping fp32 would quadruple the transfer; the [-1,1]
    normalize happens on device inside the jitted programs
    (``_DEV_NORM``).

    ``augment_pct`` applies one random reference-inventory op
    (``data/augment.random_augment``) to that fraction of TRAIN images
    per epoch (fresh each epoch — augmented pixels are never cached);
    ``writer_styles`` renders each synthetic sample with its writer's
    consistent style so the train distribution has real visual
    diversity instead of one font at one weight."""
    import os

    from PIL import Image

    from ..data.augment import random_augment
    from ..data.synthetic import render_word, stable_seed, writer_style
    from ..utils.images import resize_and_pad

    order = np.arange(len(samples))
    if rng is not None:
        rng.shuffle(order)
    stop = len(samples) - batch_size + 1 if drop_remainder else len(samples)
    for start in range(0, max(stop, 0), batch_size):
        imgs, words = [], []
        for i in order[start : start + batch_size]:
            s = samples[int(i)]
            key = (s.image, s.word, s.writer if writer_styles else "")
            arr = _RENDER_CACHE.get(key)
            if arr is None:
                p = os.path.join(image_dir, s.image) if image_dir else ""
                if p and os.path.exists(p):
                    arr = np.asarray(Image.open(p).convert("RGB"))
                else:
                    style = writer_style(s.writer) if writer_styles else None
                    arr = render_word(s.word, 50, 250,
                                      seed=stable_seed(s.image), style=style)
                arr = resize_and_pad(arr, 50, 250)
                if len(_RENDER_CACHE) >= _RENDER_CACHE_CAP:
                    _RENDER_CACHE.pop(next(iter(_RENDER_CACHE)))
                _RENDER_CACHE[key] = arr
            if augment_pct and rng is not None and rng.random() * 100 < augment_pct:
                arr = np.ascontiguousarray(random_augment(arr, rng))
            imgs.append(arr)
            words.append(s.word)
        yield np.stack(imgs), words


def main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    args = build_parser().parse_args(argv)

    os.makedirs(args.save_dir, exist_ok=True)
    if args.mode == "test":
        # fail FAST: test mode evaluates the best checkpoint, never
        # fresh-init params — refuse before even the jax/flax imports
        best_path = os.path.join(args.save_dir, "best_params.pkl")
        if not os.path.exists(best_path):
            raise SystemExit(
                f"--mode test needs trained weights: {best_path} not found "
                f"(run --mode train with the same --save_dir first)"
            )

    import jax
    import jax.numpy as jnp
    import optax

    from ..data.alphabets import phoc_dim, phos_dim
    from ..data.phoc import phoc_labels
    from ..data.phos import phos_labels
    from ..eval.zsl import zsl_accuracy
    from ..models.phoscnet import FixedPatchPrompter, PHOSCNet, phosc_loss
    from ..utils.stop_flag import StopFlag
    phos_size = phos_dim(args.language)
    phoc_size = phoc_dim(args.language)

    model = PHOSCNet(phos_size=phos_size, phoc_size=phoc_size, trunk=args.model)
    prompter = FixedPatchPrompter() if args.prompt else None

    train_samples = _load_split(args.train_csv, args.image_dir, args.synthetic,
                                args.language, n_synth=args.n_synth,
                                renders_per_word=args.renders_per_word)
    valid_samples = _load_split(args.valid_csv, args.image_dir, args.synthetic,
                                args.language, n_synth=args.n_synth, split="valid")

    # GZSL margin-calibration holdout: carve a fraction of the TRAIN
    # vocabulary out of training entirely, so `--mode test` can measure
    # genuine unseen-word bias on words disjoint from both the trained
    # vocabulary and the test split (the held-out words are recorded in
    # calib_words.json and excluded from every reported metric).
    # The calib_words.json on disk must always describe the checkpoint
    # on disk. A previous run's file is only invalidated once THIS run
    # writes its first best_params.pkl, so the (ckpt, calib) pair stays
    # consistent even if the retrain crashes or is flag-stopped before
    # any checkpoint lands; the update happens atomically alongside
    # every best-ckpt write below. ``calib_payload`` is the record this
    # run will install: a word list for a genuine holdout, None for a
    # full-vocabulary run (which removes any stale file).
    calib_payload = None
    if args.mode == "train" and args.calib_words_fraction > 0:
        vocab = sorted({s.word for s in train_samples})
        vrng = np.random.default_rng(args.seed)
        vrng.shuffle(vocab)
        k = max(1, int(len(vocab) * args.calib_words_fraction))
        calib_words = set(vocab[:k])
        calib_payload = sorted(calib_words)
        train_samples = [s for s in train_samples if s.word not in calib_words]
        logging.info("calibration holdout: %d words held out, %d words trained",
                     len(calib_words), len({s.word for s in train_samples}))

    rng = jax.random.PRNGKey(args.seed)
    init_img = np.zeros((2, 50, 250, 3), np.float32)
    if args.mode == "train":
        params = model.init(rng, init_img)
        if prompter is not None:
            prompt_params = prompter.init(rng, init_img)
    else:
        # test mode: params come from the checkpoint — skip the
        # on-device init (a full trunk forward compile) entirely
        import pickle

        with open(best_path, "rb") as f:
            params = pickle.load(f)

    # reduce-on-plateau LR matching ReduceLROnPlateau(opt, 'max',
    # factor=0.25, patience=5, threshold=0.0001, cooldown=2) on the
    # validation ZSL accuracy (main.py:267-268). optax's transform is
    # min-mode, so we feed it the NEGATED accuracy; it sees one `value`
    # per *step* while the reference's patience/cooldown are in epochs,
    # so both are scaled by steps/epoch. The value is constant within an
    # epoch (last validation result); before the first validation we
    # feed +1e9 ("no best yet") so nothing registers as a plateau.
    steps_per_epoch = max(1, len(train_samples) // args.batch_size)
    if args.plateau:
        tx = optax.chain(
            optax.adamw(args.lr, weight_decay=5e-5),
            optax.contrib.reduce_on_plateau(
                factor=0.25,
                patience=args.plateau_patience * steps_per_epoch,
                cooldown=2 * steps_per_epoch,
                atol=1e-4,
            ),
        )
    else:
        # plain AdamW; extra-args wrapper swallows the unused `value=`
        tx = optax.with_extra_args_support(optax.adamw(args.lr, weight_decay=5e-5))
    opt_state = tx.init(params) if args.mode == "train" else None

    def current_lr(opt_state) -> float:
        """Effective lr = base lr x plateau scale (for the log, like the
        reference's opt.param_groups[0]['lr'] column)."""
        if args.plateau:
            return args.lr * float(opt_state[1].scale)
        return args.lr

    words = sorted({s.word for s in train_samples})
    phos_map = phos_labels(words, args.language)
    phoc_map = phoc_labels(words, args.language)

    step_count = 0

    def _dev_norm(imgs):
        # uint8 -> [-1,1] on DEVICE (host ships uint8: 4x less transfer)
        return imgs.astype(jnp.float32) / 127.5 - 1.0

    @jax.jit
    def train_step(params, opt_state, imgs, tp, tc, plateau_value, step):
        def loss_fn(p):
            out = model.apply(p, _dev_norm(imgs), deterministic=False,
                              rngs={"dropout": jax.random.fold_in(rng, step)})
            return phosc_loss(out, tp, tc)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(
            grads, opt_state, params, value=plateau_value
        )
        return optax.apply_updates(params, updates), opt_state, loss

    stop = StopFlag(args.flagFile or None)
    best_acc = -1.0
    log_path = os.path.join(args.save_dir, "log.csv")
    if args.mode == "train":
        with open(log_path, "a", newline="") as f:
            csv.writer(f).writerow(["epoch", "loss", "zsl_acc", "lr"])

    # params enter as a jit ARGUMENT: a closed-over param tree embeds
    # as constants (one compile per epoch + oversized programs on
    # remote-compile backends)
    apply_eval = jax.jit(lambda p, imgs: model.apply(p, _dev_norm(imgs)))

    if args.mode == "train":
        np_rng = np.random.default_rng(args.seed)
        plateau_value = jnp.asarray(1e9)  # "no best yet"
        for epoch in range(args.epochs):
            if stop.should_stop():
                logging.info("flag stop at epoch %d", epoch)
                break
            losses = []
            for imgs, batch_words in _image_batches(
                train_samples, args.image_dir, args.batch_size, np_rng,
                augment_pct=args.augment, writer_styles=bool(args.writer_styles),
            ):
                tp = jnp.asarray(np.stack([phos_map[w] for w in batch_words]), jnp.float32)
                tc = jnp.asarray(np.stack([phoc_map[w] for w in batch_words]), jnp.float32)
                params, opt_state, loss = train_step(
                    params, opt_state, jnp.asarray(imgs), tp, tc, plateau_value,
                    jnp.asarray(step_count, jnp.int32),
                )
                step_count += 1
                losses.append(float(loss))

            cur = params
            acc, _ = zsl_accuracy(
                lambda im: apply_eval(cur, jnp.asarray(im)),
                _image_batches(valid_samples, args.image_dir, args.batch_size,
                           drop_remainder=False),
                [s.word for s in valid_samples],
                args.language,
            )
            # validation ZSL accuracy drives the plateau schedule
            # (negated: optax is min-mode, reference runs 'max' mode)
            plateau_value = jnp.asarray(-acc)
            mean_loss = float(np.mean(losses)) if losses else 0.0
            lr_now = current_lr(opt_state)
            logging.info("epoch %d loss %.4f zsl %.4f lr %.2e",
                         epoch, mean_loss, acc, lr_now)
            with open(log_path, "a", newline="") as f:
                csv.writer(f).writerow([epoch, mean_loss, acc, lr_now])
            if acc > best_acc:  # best-ckpt keep (main.py:297-310)
                best_acc = acc
                import json
                import pickle

                # atomic: a reader (or a kill) must never see a half-written pickle
                tmp = os.path.join(args.save_dir, "best_params.pkl.tmp")
                with open(tmp, "wb") as f:
                    pickle.dump(jax.tree_util.tree_map(np.asarray, params), f)
                os.replace(tmp, os.path.join(args.save_dir, "best_params.pkl"))
                # keep the calib record in lockstep with the checkpoint
                # it describes (see calib_payload above)
                calib_path = os.path.join(args.save_dir, "calib_words.json")
                if calib_payload is not None:
                    ctmp = calib_path + ".tmp"
                    with open(ctmp, "w") as f:
                        json.dump(calib_payload, f)
                    os.replace(ctmp, calib_path)
                elif os.path.exists(calib_path):
                    os.remove(calib_path)
                    logging.info("removed stale calib_words.json (trained "
                                 "with --calib_words_fraction 0)")
    else:
        # test mode evaluates the BEST checkpoint from --save_dir (loaded
        # above, before any on-device work), never fresh-init params
        # (reference loads epoch.pt, main.py:372-390)
        test_samples = _load_split(args.test_csv, args.image_dir, args.synthetic,
                                   args.language, n_synth=args.n_synth, split="test")
        fn = lambda im: apply_eval(params, jnp.asarray(im))

        # margin-calibration split for the GZSL decision rule. The
        # honest construct needs samples of words the model did NOT
        # train on that are also disjoint from the test split —
        # produced by `--mode train --calib_words_fraction` (holds the
        # words out of training and records them in calib_words.json).
        # Without that file the fallback draws pseudo-unseen words from
        # the TRAINED vocabulary, which measures no bias (the model is
        # only biased toward words it actually trained on — verified:
        # the sweep lands on gamma=0 and valmargin == uncalibrated).
        calib_path = os.path.join(args.save_dir, "calib_words.json")
        if os.path.exists(calib_path):
            import json

            calib_words = set(json.load(open(calib_path)))
            seen_samples = [s for s in train_samples
                            if s.word not in calib_words]
            pu = [s for s in train_samples if s.word in calib_words]
            ps = seen_samples
        else:
            seen_samples = train_samples
            vocab_rng = np.random.default_rng(args.seed)
            seen_vocab = sorted({s.word for s in train_samples})
            vocab_rng.shuffle(seen_vocab)
            cut = max(1, int(len(seen_vocab) * 0.8))
            ps_words = set(seen_vocab[:cut])
            ps = [s for s in train_samples if s.word in ps_words]
            pu = [s for s in train_samples if s.word not in ps_words]

        acc, by_len = zsl_accuracy(
            fn,
            _image_batches(test_samples, args.image_dir, args.batch_size,
                           drop_remainder=False),
            [s.word for s in test_samples],
            args.language,
        )
        # GZSL: seen split = the trained corpus, unseen = the zero-shot
        # test corpus, both decoded against the union lexicon
        # (main.py:334-438, engine.py:172-268). Calibration-holdout
        # words (never trained, not in the test split) are excluded
        # from the seen metric.
        from ..eval.zsl import gzsl_accuracy

        gz = gzsl_accuracy(
            fn,
            _image_batches(seen_samples, args.image_dir, args.batch_size,
                           drop_remainder=False),
            _image_batches(test_samples, args.image_dir, args.batch_size,
                           drop_remainder=False),
            [s.word for s in seen_samples],
            [s.word for s in test_samples],
            args.language,
        )
        # extra diagnostic on top of the reference protocol: calibrated
        # stacking shows the unseen signal the uncalibrated argmax hides
        from ..eval.zsl import gzsl_calibrated_stacking

        # one shared margin grid for the diagnostic sweep AND the
        # valmargin choice (identical grids make the chosen gamma a
        # curve lookup); default 51 points = 0.01 steps over [0, 0.5]
        gammas = np.linspace(0.0, 0.5, max(2, args.gamma_points))
        cal = gzsl_calibrated_stacking(
            fn,
            _image_batches(seen_samples, args.image_dir, args.batch_size,
                           drop_remainder=False),
            _image_batches(test_samples, args.image_dir, args.batch_size,
                           drop_remainder=False),
            [s.word for s in seen_samples],
            [s.word for s in test_samples],
            args.language,
            gammas=gammas,
        )
        # validation-chosen margin INSIDE the reference decision rule
        # (round-4: the uncalibrated protocol's 0.17 harmonic is pure
        # seen-bias): sweep the seen-class margin on the calibration
        # construct above, then apply the single chosen gamma to the
        # test-time union-lexicon argmax — test data never touches the
        # choice.
        from ..eval.zsl import gzsl_accuracy_with_margin

        val_best = gzsl_calibrated_stacking(
            fn,
            _image_batches(ps, args.image_dir, args.batch_size,
                           drop_remainder=False),
            _image_batches(pu, args.image_dir, args.batch_size,
                           drop_remainder=False),
            [s.word for s in ps],
            [s.word for s in pu],
            args.language,
            gammas=gammas,
        )["best"]
        # `cal` already evaluated the identical decision rule on the
        # identical (seen, test) construct over the same default gamma
        # grid — the chosen gamma is a curve lookup, not two more full
        # forward passes over both corpora
        hit = next((r for r in cal["curve"]
                    if abs(r["gamma"] - val_best["gamma"]) < 1e-9), None)
        if hit is not None:
            vm = {"gamma": float(val_best["gamma"]), "seen": hit["seen"],
                  "unseen": hit["unseen"],
                  "harmonic_mean": hit["harmonic_mean"]}
        else:  # custom grid fallback: evaluate the one gamma directly
            vm = gzsl_accuracy_with_margin(
                fn,
                _image_batches(seen_samples, args.image_dir, args.batch_size,
                               drop_remainder=False),
                _image_batches(test_samples, args.image_dir, args.batch_size,
                               drop_remainder=False),
                [s.word for s in seen_samples],
                [s.word for s in test_samples],
                gamma=val_best["gamma"],
                version=args.language,
            )
        with_len = None
        if args.len_counter:
            # length-estimation evaluation (gzslAccuracyTestAni with
            # lenEstimation, engine.py:352-438): the trained character
            # counter predicts word length alongside the ZSL/GZSL decode
            import pickle

            from ..eval.zsl import zsl_gzsl_with_length
            from ..models.charcounter import CharacterCounterNet

            with open(args.len_counter, "rb") as f:
                counter_params = pickle.load(f)
            counter = CharacterCounterNet(outputs=args.counter_outputs)
            counter_apply = jax.jit(
                lambda p, im: counter.apply(p, _dev_norm(im)))

            def counter_fn(images):
                # classifier head -> the reference's thresholded
                # multi-hot protocol ((lv > 0.5).sum(-1) == argmax + 1)
                probs = counter_apply(counter_params, jnp.asarray(images))
                pred = jnp.argmax(probs, axis=-1) + 1
                return (jnp.arange(args.counter_outputs)[None, :]
                        < pred[:, None]).astype(jnp.float32)

            # seen_samples, not train_samples: calibration-holdout words
            # were never trained and are disjoint from the test split —
            # they must not enter the length-eval lexicons as seen-
            # flagged distractors (they are excluded from every metric)
            seen_words = sorted({s.word for s in seen_samples})
            union_words = sorted({s.word for s in seen_samples}
                                 | {s.word for s in test_samples})
            with_len = zsl_gzsl_with_length(
                fn,
                _image_batches(test_samples, args.image_dir, args.batch_size,
                               drop_remainder=False),
                seen_words,
                union_words,
                counter_fn=counter_fn,
                version=args.language,
            )
        logging.info("ZSL test acc %.4f by-len %s GZSL %s calibrated-best %s"
                     " val-margin %s with-length %s",
                     acc, by_len, gz, cal["best"], vm, with_len)
        with open(os.path.join(args.save_dir, "testresults.txt"), "a") as f:
            f.write(f"zsl={acc}\nby_len={by_len}\n")
            f.write(f"gzsl_seen={gz['seen']}\ngzsl_unseen={gz['unseen']}\n"
                    f"gzsl_harmonic={gz['harmonic_mean']}\n")
            b = cal["best"]
            f.write(f"gzsl_calibrated_gamma={b['gamma']}\n"
                    f"gzsl_calibrated_seen={b['seen']}\n"
                    f"gzsl_calibrated_unseen={b['unseen']}\n"
                    f"gzsl_calibrated_harmonic={b['harmonic_mean']}\n")
            f.write(f"gzsl_valmargin_gamma={vm['gamma']}\n"
                    f"gzsl_valmargin_seen={vm['seen']}\n"
                    f"gzsl_valmargin_unseen={vm['unseen']}\n"
                    f"gzsl_valmargin_harmonic={vm['harmonic_mean']}\n")
            if with_len is not None:
                f.write(f"len_zsl={with_len['zsl']}\n"
                        f"len_gzsl={with_len['gzsl']}\n"
                        f"length_accuracy={with_len['length_accuracy']}\n"
                        f"length_fuzzy_accuracy="
                        f"{with_len['length_fuzzy_accuracy']}\n")


if __name__ == "__main__":
    main()
