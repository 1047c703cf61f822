"""Shared model layers (NHWC, bf16 compute / fp32 params & norms).

TPU-first counterparts of the reference building blocks
(``unet.py:96-149,429-431,472-551``): convolutions are lowered to the
MXU by XLA in NHWC layout, GroupNorm statistics run in fp32 on the VPU,
and every "zero module" (``unet.py`` ``zero_module``) becomes a
zeros-initialised Flax param so residual branches start as identity.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def timestep_embedding(timesteps: jax.Array, dim: int, max_period: float = 10000.0) -> jax.Array:
    """Sinusoidal timestep embedding, [cos | sin] order like the
    reference (``unet.py:96-116``). Always fp32."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def char_positional_encoding(max_seq_len: int, dim: int) -> jax.Array:
    """The CharacterEncoder's positional table (``unet.py:876-882``):
    pe[p, 2i] = sin(p / 10000^(2i/d) ... reference uses exponent i/d for
    even and (i+1)/d for odd slots — reproduced exactly."""
    pos = jnp.arange(max_seq_len, dtype=jnp.float32)[:, None]
    i = jnp.arange(0, dim, 2, dtype=jnp.float32)[None, :]
    pe_even = jnp.sin(pos / jnp.power(10000.0, i / dim))
    pe_odd = jnp.cos(pos / jnp.power(10000.0, (i + 1.0) / dim))
    pe = jnp.stack([pe_even, pe_odd], axis=-1).reshape(max_seq_len, -1)
    return pe[:, :dim]


class GroupNorm32(nn.Module):
    """GroupNorm(32) with fp32 statistics regardless of activation dtype
    (reference ``GroupNorm32`` ``unet.py:429-431``).

    Hand-rolled instead of ``nn.GroupNorm``: statistics accumulate in
    fp32 via the reduction dtype without materialising an fp32 copy of
    the bf16 activation tensor — the UNet is HBM-bound, so halving norm
    traffic matters more than op count.
    """

    num_groups: int = 32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        g = min(self.num_groups, c)
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        xg = x.reshape(x.shape[:-1] + (g, c // g))
        red = tuple(range(1, x.ndim - 1)) + (x.ndim,)
        mu = jnp.mean(xg, axis=red, keepdims=True, dtype=jnp.float32)
        var = (
            jnp.mean(jnp.square(xg.astype(jnp.float32)), axis=red, keepdims=True)
            - jnp.square(mu)
        )
        inv = jax.lax.rsqrt(var + self.epsilon)
        out = (xg.astype(jnp.float32) - mu) * inv
        out = out.reshape(x.shape) * scale + bias
        return out.astype(x.dtype)


class Conv2D(nn.Module):
    """3x3 / 1x1 conv wrapper with optional zero-init (fp32 params,
    configurable compute dtype)."""

    features: int
    kernel: tuple = (3, 3)
    strides: tuple = (1, 1)
    padding: Any = "SAME"
    zero_init: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel_init = (
            nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        )
        return nn.Conv(
            features=self.features,
            kernel_size=self.kernel,
            strides=self.strides,
            padding=self.padding,
            kernel_init=kernel_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class Dense(nn.Module):
    features: int
    use_bias: bool = True
    zero_init: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel_init = (
            nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        )
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=kernel_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class GEGLU(nn.Module):
    """Gated GELU projection (``unet.py:122-131``)."""

    dim_out: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        proj = Dense(self.dim_out * 2, dtype=self.dtype)(x)
        x, gate = jnp.split(proj, 2, axis=-1)
        return x * nn.gelu(gate)


class FeedForward(nn.Module):
    """Transformer FF with GEGLU gating, mult 4 (``unet.py:134-149``).

    On TPU, ``BasicTransformerBlock`` bypasses this module's forward and
    runs the whole FF sub-layer (LayerNorm + both matmuls + GEGLU +
    residual) as one Pallas kernel over the same parameters
    (``ops/ffn_pallas.fused_ln_geglu_ffn``)."""

    dim: int
    mult: int = 4
    dropout: float = 0.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        inner = int(self.dim * self.mult)
        x = GEGLU(inner, dtype=self.dtype)(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return Dense(self.dim, dtype=self.dtype)(x)


class Upsample(nn.Module):
    """Nearest 2x + 3x3 conv (``unet.py:472-500``)."""

    channels: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        # 2x nearest as broadcast+reshape (avoids the gather-based
        # jax.image.resize lowering on TPU)
        x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
        x = x.reshape(b, h * 2, w * 2, c)
        return Conv2D(self.channels, dtype=self.dtype)(x)


class Downsample(nn.Module):
    """3x3 stride-2 conv (``unet.py:515-551``, conv_resample=True).

    Explicit (1,1) padding: torch's ``padding=1`` is symmetric, while
    SAME would pad (0,1) for even inputs — parity with reference
    checkpoints requires the torch layout."""

    channels: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return Conv2D(
            self.channels, strides=(2, 2), padding=((1, 1), (1, 1)),
            dtype=self.dtype,
        )(x)
