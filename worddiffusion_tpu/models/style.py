"""Writer-style image encoder.

Replaces the reference ``feature_extractor.py:4-43`` (timm ResNet50
with global max pool producing writer-style feature vectors; the
DiffusionPen triplet weights live on the author's cluster). Since timm
is unavailable and the weights are not shipped, this is a from-scratch
ResNet encoder with the same contract: image -> fixed-size style
vector, trainable or frozen, used to build the writer-style dictionary
(the in-repo stand-in for ``cropStyleDict_Numpy.pkl``,
``unet.py:1159-1161``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


class _Bottleneck(nn.Module):
    features: int
    stride: int = 1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        res = x
        h = nn.Conv(self.features, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="c1")(x)
        h = nn.GroupNorm(num_groups=min(32, self.features), dtype=jnp.float32,
                         param_dtype=jnp.float32, name="n1")(
            h.astype(jnp.float32)).astype(self.dtype)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding="SAME", dtype=self.dtype, param_dtype=jnp.float32,
                    name="c2")(h)
        h = nn.GroupNorm(num_groups=min(32, self.features), dtype=jnp.float32,
                         param_dtype=jnp.float32, name="n2")(
            h.astype(jnp.float32)).astype(self.dtype)
        h = nn.relu(h)
        out_f = self.features * 4
        h = nn.Conv(out_f, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="c3")(h)
        h = nn.GroupNorm(num_groups=min(32, out_f), dtype=jnp.float32,
                         param_dtype=jnp.float32, name="n3")(
            h.astype(jnp.float32)).astype(self.dtype)
        if res.shape[-1] != out_f or self.stride != 1:
            res = nn.Conv(out_f, (1, 1), strides=(self.stride, self.stride),
                          dtype=self.dtype, param_dtype=jnp.float32,
                          name="sc")(res)
        return nn.relu(h + res)


class StyleEncoder(nn.Module):
    """ResNet50-shaped trunk, global max pool -> [B, 2048] style vec
    (or ``out_dim`` with a projection head)."""

    out_dim: int = 0          # 0: raw 2048-d pooled features
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x.astype(jnp.dtype(self.dtype))
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding="SAME",
                    dtype=self.dtype, param_dtype=jnp.float32, name="stem")(x)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding="SAME")
        for stage, (feats, blocks, stride) in enumerate(
            [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)]
        ):
            for b in range(blocks):
                h = _Bottleneck(
                    feats, stride if b == 0 else 1, dtype=self.dtype,
                    name=f"s{stage}b{b}",
                )(h)
        feat = jnp.max(h, axis=(1, 2)).astype(jnp.float32)  # global max pool
        if self.out_dim:
            feat = nn.Dense(self.out_dim, param_dtype=jnp.float32,
                            name="proj")(feat)
        return feat


def triplet_loss(anchor, positive, negative, margin: float = 0.2):
    """Writer-style triplet objective (DiffusionPen-style training of
    the frozen style encoder)."""
    d_pos = jnp.sum(jnp.square(anchor - positive), axis=-1)
    d_neg = jnp.sum(jnp.square(anchor - negative), axis=-1)
    return jnp.mean(jnp.maximum(d_pos - d_neg + margin, 0.0))


def build_style_dict(
    encoder: StyleEncoder, params, images_by_writer: dict, batch_size: int = 32
) -> dict[str, np.ndarray]:
    """writer -> mean style vector over that writer's crops. In-repo
    replacement for the cluster pickle ``cropStyleDict_Numpy.pkl``."""
    fn = jax.jit(lambda imgs: encoder.apply(params, imgs))
    out = {}
    for writer, imgs in images_by_writer.items():
        vecs = []
        for s in range(0, len(imgs), batch_size):
            vecs.append(np.asarray(fn(jnp.asarray(imgs[s : s + batch_size]))))
        out[writer] = np.concatenate(vecs).mean(axis=0)
    return out
