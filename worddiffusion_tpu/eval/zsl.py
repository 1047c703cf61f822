"""Zero-shot / generalized zero-shot word recognition accuracy.

Rebuild of ``ResPhoSCNetZSL/modules/engine.py:79-268``. The reference
decodes each prediction with a *Python double loop* over the lexicon
computing per-word cosine similarity (``engine.py:140-144``); here the
whole decode is one [B, D] x [D, W] matmul on the MXU followed by an
argmax — identical result, thousands of times faster.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.phosc import lexicon_matrix


def _normalize(m, eps=1e-8):
    return m / (jnp.linalg.norm(m, axis=-1, keepdims=True) + eps)


@jax.jit
def cosine_decode_indices(pred: jax.Array, lexicon: jax.Array) -> jax.Array:
    """pred [B, D], lexicon [W, D] -> argmax cosine word index [B]."""
    sim = _normalize(pred) @ _normalize(lexicon).T
    return jnp.argmax(sim, axis=-1)


def decode_words(
    pred_phosc: np.ndarray, words: Sequence[str], lexicon: np.ndarray
) -> list[str]:
    idx = np.asarray(cosine_decode_indices(jnp.asarray(pred_phosc), jnp.asarray(lexicon)))
    return [words[i] for i in idx]


def zsl_accuracy(
    apply_fn: Callable[[np.ndarray], dict],
    batches: Iterable[tuple[np.ndarray, Sequence[str]]],
    lexicon_words: Sequence[str],
    version: str = "eng",
) -> tuple[float, dict[int, float]]:
    """Accuracy of cosine-decode against the lexicon of candidate words.

    ``apply_fn(images) -> {'phos','phoc'}``; batches yield
    (images NHWC, target words). Returns (accuracy, per-length accuracy)
    like the reference (``engine.py:102-164``).
    """
    words, lex = lexicon_matrix(list(lexicon_words), version)
    lex_j = jnp.asarray(lex)
    correct = 0
    total = 0
    by_len_correct: dict[int, int] = {}
    by_len_total: dict[int, int] = {}
    for images, targets in batches:
        out = apply_fn(images)
        pred = jnp.concatenate([out["phos"], out["phoc"]], axis=-1)
        idx = np.asarray(cosine_decode_indices(pred, lex_j))
        for i, target in enumerate(targets):
            guess = words[idx[i]]
            L = len(target)
            by_len_total[L] = by_len_total.get(L, 0) + 1
            total += 1
            if guess == target:
                correct += 1
                by_len_correct[L] = by_len_correct.get(L, 0) + 1
    acc_by_len = {
        L: 100.0 * by_len_correct.get(L, 0) / n for L, n in by_len_total.items()
    }
    return (correct / max(total, 1)), acc_by_len


def gzsl_accuracy(
    apply_fn: Callable[[np.ndarray], dict],
    seen_batches: Iterable[tuple[np.ndarray, Sequence[str]]],
    unseen_batches: Iterable[tuple[np.ndarray, Sequence[str]]],
    seen_words: Sequence[str],
    unseen_words: Sequence[str],
    version: str = "eng",
) -> dict:
    """GZSL: both splits decoded against the UNION lexicon
    (``engine.py:186-200``); reports seen/unseen accuracy and their
    harmonic mean."""
    union = list(dict.fromkeys(list(seen_words) + list(unseen_words)))
    acc_seen, _ = zsl_accuracy(apply_fn, seen_batches, union, version)
    acc_unseen, _ = zsl_accuracy(apply_fn, unseen_batches, union, version)
    h = (
        2 * acc_seen * acc_unseen / (acc_seen + acc_unseen)
        if (acc_seen + acc_unseen) > 0
        else 0.0
    )
    return {"seen": acc_seen, "unseen": acc_unseen, "harmonic_mean": h}


def gzsl_calibrated_stacking(
    apply_fn: Callable[[np.ndarray], dict],
    seen_batches: Iterable[tuple[np.ndarray, Sequence[str]]],
    unseen_batches: Iterable[tuple[np.ndarray, Sequence[str]]],
    seen_words: Sequence[str],
    unseen_words: Sequence[str],
    version: str = "eng",
    gammas: Optional[Sequence[float]] = None,
) -> dict:
    """GZSL with calibrated stacking (Chao et al., ECCV 2016): subtract
    a bias ``gamma`` from every SEEN word's cosine score before the
    union-lexicon argmax, sweeping gamma and reporting the full
    seen/unseen trade-off curve plus the best-harmonic-mean point.

    This is an EXTRA diagnostic on top of the reference's uncalibrated
    protocol (``engine.py:172-268``, reported by :func:`gzsl_accuracy`):
    uncalibrated GZSL collapses to near-zero unseen accuracy whenever
    the recognizer is confident on its training vocabulary (the classic
    seen-bias), which hides how much unseen signal the embedding
    actually carries. gamma is swept on the evaluation split itself, so
    quote the curve (or pick gamma on a held-out split), not just the
    peak.
    """
    union = list(dict.fromkeys(list(seen_words) + list(unseen_words)))
    words, lex = lexicon_matrix(union, version)
    lex_j = jnp.asarray(lex)
    in_seen = set(seen_words)
    seen_mask = np.array([w in in_seen for w in words], np.float32)

    def collect(batches):
        sims, targets = [], []
        for images, tg in batches:
            out = apply_fn(images)
            pred = jnp.concatenate([out["phos"], out["phoc"]], axis=-1)
            sims.append(np.asarray(_normalize(pred) @ _normalize(lex_j).T))
            targets.extend(tg)
        return (np.concatenate(sims) if sims else np.zeros((0, len(words)))), targets

    s_sim, s_tg = collect(seen_batches)
    u_sim, u_tg = collect(unseen_batches)
    if gammas is None:
        gammas = np.linspace(0.0, 0.5, 26)

    def acc(sim, tg, g):
        if not tg:
            return 0.0
        idx = (sim - g * seen_mask).argmax(axis=1)
        return float(np.mean([words[i] == t for i, t in zip(idx, tg)]))

    curve = []
    for g in gammas:
        a_s, a_u = acc(s_sim, s_tg, g), acc(u_sim, u_tg, g)
        h = 2 * a_s * a_u / (a_s + a_u) if (a_s + a_u) > 0 else 0.0
        curve.append({"gamma": round(float(g), 4), "seen": a_s, "unseen": a_u,
                      "harmonic_mean": h})
    best = max(curve, key=lambda r: r["harmonic_mean"])
    return {"best": best, "curve": curve}


def gzsl_accuracy_with_margin(
    apply_fn: Callable[[np.ndarray], dict],
    seen_batches: Iterable[tuple[np.ndarray, Sequence[str]]],
    unseen_batches: Iterable[tuple[np.ndarray, Sequence[str]]],
    seen_words: Sequence[str],
    unseen_words: Sequence[str],
    gamma: float,
    version: str = "eng",
) -> dict:
    """The reference GZSL decision rule (union-lexicon cosine argmax,
    ``engine.py:186-200``) with ONE fixed seen-class margin ``gamma``
    subtracted from seen words' scores before the argmax.

    Unlike :func:`gzsl_calibrated_stacking` (which sweeps gamma on the
    evaluation split itself — a diagnostic, not a protocol), this
    evaluates a margin chosen elsewhere, e.g. on a validation construct
    built purely from seen-class data (hold out a fraction of the seen
    vocabulary as pseudo-unseen and pick the best-harmonic gamma there,
    see ``cli/train_phosc`` test mode). Test data never touches the
    choice, so the resulting seen/unseen/harmonic numbers are
    protocol-honest."""
    cal = gzsl_calibrated_stacking(
        apply_fn, seen_batches, unseen_batches, seen_words, unseen_words,
        version, gammas=[float(gamma)],
    )
    r = cal["curve"][0]
    return {"gamma": float(gamma), "seen": r["seen"], "unseen": r["unseen"],
            "harmonic_mean": r["harmonic_mean"]}


def zsl_gzsl_with_length(
    apply_fn: Callable[[np.ndarray], dict],
    batches: Iterable[tuple[np.ndarray, Sequence[str]]],
    seen_words: Sequence[str],
    union_words: Sequence[str],
    counter_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    threshold: float = 0.5,
    version: str = "eng",
) -> dict:
    """The combined evaluation of ``gzslAccuracyTestAni``
    (``engine.py:273-461``): each prediction is decoded against BOTH the
    seen lexicon (zsl) and the union lexicon (gzsl); optionally a
    length-estimation head (sigmoid multi-hot over length slots,
    thresholded and summed — ``engine.py:370-375``) is scored for exact
    and fuzzy (+-1) length accuracy."""
    s_words, s_lex = lexicon_matrix(list(seen_words), version)
    u_words, u_lex = lexicon_matrix(list(union_words), version)
    s_lex_j, u_lex_j = jnp.asarray(s_lex), jnp.asarray(u_lex)
    n = zsl_ok = gzsl_ok = len_ok = len_fuzzy = 0
    for images, targets in batches:
        out = apply_fn(images)
        pred = jnp.concatenate([out["phos"], out["phoc"]], axis=-1)
        zi = np.asarray(cosine_decode_indices(pred, s_lex_j))
        gi = np.asarray(cosine_decode_indices(pred, u_lex_j))
        len_pred = None
        if counter_fn is not None:
            lv = np.asarray(counter_fn(images))
            len_pred = (lv > threshold).sum(axis=-1)
        for i, target in enumerate(targets):
            n += 1
            zsl_ok += s_words[zi[i]] == target
            gzsl_ok += u_words[gi[i]] == target
            if len_pred is not None:
                exact = int(len_pred[i]) == len(target)
                len_ok += exact
                # the reference's fuzzyAccuracy is the *elif* branch
                # (engine.py:432-435): +-1 misses only, exact hits are
                # NOT double-counted into fuzzy
                len_fuzzy += (not exact) and (
                    abs(int(len_pred[i]) - len(target)) <= 1)
    res = {
        "zsl": zsl_ok / max(n, 1),
        "gzsl": gzsl_ok / max(n, 1),
    }
    if counter_fn is not None:
        res["length_accuracy"] = len_ok / max(n, 1)
        res["length_fuzzy_accuracy"] = len_fuzzy / max(n, 1)
    return res


def split_seen_unseen(
    samples: Sequence, seen_fraction: float = 0.8, seed: int = 0
) -> tuple[list, list]:
    """Word-level ZSL split: unseen words never appear in training
    (``dataset_manipulation/split_to_seen_and_unseen.py:3-27``)."""
    words = sorted({s.word for s in samples})
    rng = np.random.default_rng(seed)
    rng.shuffle(words)
    cut = int(len(words) * seen_fraction)
    seen_words = set(words[:cut])
    seen = [s for s in samples if s.word in seen_words]
    unseen = [s for s in samples if s.word not in seen_words]
    return seen, unseen
