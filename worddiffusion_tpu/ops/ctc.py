"""CTC loss wrapper and greedy decoding.

The loss is ``optax.ctc_loss`` (device-side, jittable). The greedy
decoder reproduces the reference ``callOCR`` semantics exactly
(``regenerateFromtrain2.py:291-315``): per-frame argmax, collapse
adjacent repeats, map through the alphabet, drop the blank symbol
('_'), strip — the argmax runs on device, the string assembly on host.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax


def ctc_loss(
    logits: jax.Array,       # [B, T, K]
    labels: jax.Array,       # [B, N]
    label_lengths: jax.Array,  # [B]
    blank_id: int = 1,
) -> jax.Array:
    logit_pad = jnp.zeros(logits.shape[:2], jnp.float32)
    label_pad = (
        jnp.arange(labels.shape[1])[None, :] >= label_lengths[:, None]
    ).astype(jnp.float32)
    return optax.ctc_loss(logits, logit_pad, labels, label_pad, blank_id=blank_id)


def greedy_frame_ids(logits: jax.Array) -> jax.Array:
    """[B, T, K] -> [B, T] argmax ids (device side, jittable)."""
    return jnp.argmax(logits, axis=-1)


def collapse_and_decode(
    frame_ids: np.ndarray, alphabet: str, blank: str = "_"
) -> list[str]:
    """Host-side: collapse adjacent repeats, map to chars, drop blanks.

    Matches the reference decode loop including its quirk that repeats
    are collapsed *before* blank removal (so 'aa' requires a blank or
    other symbol between the two predictions).
    """
    out = []
    for row in np.asarray(frame_ids):
        prev = None
        chars = []
        for t in row:
            t = int(t)
            if t != prev:
                chars.append(alphabet[t] if t < len(alphabet) else "")
            prev = t
        out.append("".join(chars).replace(blank, "").strip())
    return out


def encode_ocr_labels(
    words: Sequence[str], alphabet: str, max_len: int
) -> tuple[np.ndarray, np.ndarray]:
    """Words -> (ids [B, max_len], lengths [B]) for ctc_loss targets.

    Characters not in the alphabet are skipped (the generated-image
    filter only ever sees in-alphabet words).
    """
    index = {c: i for i, c in enumerate(alphabet)}
    ids = np.zeros((len(words), max_len), np.int32)
    lens = np.zeros((len(words),), np.int32)
    for b, w in enumerate(words):
        seq = [index[c] for c in w if c in index][:max_len]
        ids[b, : len(seq)] = seq
        lens[b] = len(seq)
    return ids, lens
