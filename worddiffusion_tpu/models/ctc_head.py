"""Auxiliary CTC OCR head on the denoiser output.

Rebuild of ``CTCtopC`` (``unet.py:1054-1092``): a stack of (1,5)
temporal convolutions along the width axis, a class projection, then two
dense layers expanding the 32-wide latent into 256 CTC frames. The
reference finally keeps only the first height row as the CTC sequence
(``y.permute(2,3,0,1)[0]``) — reproduced.

Used with weight > 0 via ``TrainConfig.ctc_weight`` (reference
``--ocrTraining``, ``trainModifyCondition.py:757-777``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Conv2D, Dense

Dtype = Any


class CTCHead(nn.Module):
    hidden: int = 256
    layers: int = 3
    nclasses: int = 52
    dropout: float = 0.25
    frames: int = 256
    # "group" (default) or "none". Converted reference checkpoints use
    # "none": their eval-mode BatchNorm is an affine per-channel map that
    # ``convert_reference_unet`` folds into the preceding conv weights.
    norm: str = "group"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        # x: [B, H, W, C] (the predicted-noise feature map, 8x32x4)
        def temporal(name, feats, inp):
            h = Conv2D(feats, kernel=(1, 5), dtype=self.dtype, name=name)(inp)
            if self.norm == "group":
                # GroupNorm instead of the reference's BatchNorm2d: no
                # cross-replica running stats to synchronise under SPMD
                # and no mutable collections in the jitted train step.
                # The head is trained from scratch, so this is a
                # deliberate TPU-first divergence.
                h = nn.GroupNorm(
                    num_groups=min(32, feats),
                    dtype=jnp.float32,
                    param_dtype=jnp.float32,
                    name=name + "_gn",
                )(h.astype(jnp.float32)).astype(self.dtype)
            h = nn.relu(h)
            return nn.Dropout(self.dropout)(h, deterministic=deterministic)

        y = temporal("temporal_i", self.hidden, x)
        for i in range(self.layers):
            y = temporal(f"temporal_m{i}", self.hidden, y)
        y = Conv2D(self.nclasses, kernel=(1, 5), dtype=self.dtype, name="temporal_o")(y)

        # [B, H, W, K] -> widen W -> frames via dense along W
        y = y.transpose(0, 1, 3, 2)  # [B, H, K, W]
        y = Dense(self.frames // 2, dtype=self.dtype, name="lin1")(y)
        y = Dense(self.frames, dtype=self.dtype, name="lin2")(y)
        # keep height row 0 like the reference; -> [T, B, K]
        y = y[:, 0]                       # [B, K, T]
        return y.transpose(2, 0, 1).astype(jnp.float32)
