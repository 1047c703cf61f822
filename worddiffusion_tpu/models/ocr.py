"""CTC word recognizer for the OCR-in-the-loop regeneration filter.

The reference depends on an external ``htr`` package (HTRNet CRNN,
``regenerateFromtrain2.py:986-987,1111-1139``) that is absent from the
repo; this is a self-contained TPU-native replacement: an all-conv
column recognizer (no recurrence — BiLSTMs serialise badly on the MXU;
stacked dilated 1D convs give the same receptive field as a small
BiLSTM at a fraction of the step time).

Input: grayscale word image [B, 64, W, 1] in [-1, 1] (the reference
feeds channel 0 of the generated RGB, ``regenerateFromtrain2.py:297``).
Output: CTC logits [B, W/4, num_classes].
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class ConvBlock(nn.Module):
    features: int
    pool: tuple = (2, 2)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i in range(2):
            x = nn.Conv(self.features, (3, 3), padding="SAME",
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"conv{i}")(x)
            x = nn.GroupNorm(num_groups=min(32, self.features),
                             dtype=jnp.float32, param_dtype=jnp.float32,
                             name=f"gn{i}")(x.astype(jnp.float32)).astype(self.dtype)
            x = nn.relu(x)
        if self.pool != (1, 1):
            x = nn.max_pool(x, self.pool, strides=self.pool)
        return x


class CTCRecognizer(nn.Module):
    """conv trunk -> column features -> dilated temporal convs -> CTC.

    ``widths`` scales every stage (tests use narrow models; the
    production filter uses the default)."""

    num_classes: int = 54
    widths: tuple = (64, 128, 256, 256, 512)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        # [B, 64, W, 1]
        if x.shape[1] != 64:
            raise ValueError(
                f"CTCRecognizer expects 64-px-high input, got {x.shape} "
                "(the pooling stack collapses exactly 64 -> 1)"
            )
        w1, w2, w3, w4, w5 = self.widths
        x = x.astype(jnp.dtype(self.dtype))
        x = ConvBlock(w1, pool=(2, 2), dtype=self.dtype, name="b1")(x)    # 32 x W/2
        x = ConvBlock(w2, pool=(2, 2), dtype=self.dtype, name="b2")(x)   # 16 x W/4
        x = ConvBlock(w3, pool=(2, 1), dtype=self.dtype, name="b3")(x)   # 8  x W/4
        x = ConvBlock(w4, pool=(2, 1), dtype=self.dtype, name="b4")(x)   # 4  x W/4
        x = ConvBlock(w5, pool=(4, 1), dtype=self.dtype, name="b5")(x)   # 1  x W/4
        b, h, w, c = x.shape
        seq = x.reshape(b, h * w, c) if h == 1 else x.mean(axis=1)

        # temporal context: dilated 1D convs (receptive field ~ +-12 cols)
        for i, dil in enumerate([1, 2, 4]):
            res = seq
            seq = nn.Conv(w5, (3,), kernel_dilation=(dil,), padding="SAME",
                          dtype=self.dtype, param_dtype=jnp.float32,
                          name=f"t{i}")(seq)
            seq = nn.relu(seq) + res
        seq = nn.Dropout(0.25)(seq, deterministic=deterministic)
        logits = nn.Dense(self.num_classes, dtype=self.dtype,
                          param_dtype=jnp.float32, name="head")(seq)
        return logits.astype(jnp.float32)  # [B, T=W/4, K]
