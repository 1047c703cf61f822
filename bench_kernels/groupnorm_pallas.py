"""Pallas fused GroupNorm(+SiLU) kernel.

The UNet's GroupNorm layout is lane-hostile on TPU: 320 channels in 32
groups puts only 10 channels per group, so a direct grouped reduction
fragments the 128-lane dimension. This kernel keeps everything
lane-aligned instead: per-group statistics are computed with a
[C, G] one-hot *matmul* on the MXU, broadcast back to channels with the
transposed mask, and the normalise+scale+SiLU runs as one VPU pass —
one bf16 read + one bf16 write per tensor, no fp32 materialisation.

Grid: one program per batch row; the whole [H*W, C] activation block
lives in VMEM (<= 320 KB for the flagship shapes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gn_kernel(x_ref, mask_ref, maskT_ref, scale_ref, bias_ref, o_ref,
               *, eps: float, n_per_group: float, silu: bool):
    x = x_ref[0].astype(jnp.float32)                    # [S, C]
    mask = mask_ref[:]                                  # [C, G] fp32
    maskT = maskT_ref[:]                                # [G, C]
    s1 = jnp.dot(
        jnp.sum(x, axis=0, keepdims=True), mask,
        preferred_element_type=jnp.float32,
    )                                                   # [1, G]
    s2 = jnp.dot(
        jnp.sum(jnp.square(x), axis=0, keepdims=True), mask,
        preferred_element_type=jnp.float32,
    )
    mu = s1 / n_per_group
    var = s2 / n_per_group - jnp.square(mu)
    inv = jax.lax.rsqrt(var + eps)                      # [1, G]
    mu_c = jnp.dot(mu, maskT, preferred_element_type=jnp.float32)    # [1, C]
    inv_c = jnp.dot(inv, maskT, preferred_element_type=jnp.float32)
    out = (x - mu_c) * (inv_c * scale_ref[:]) + bias_ref[:]
    if silu:
        out = out * jax.nn.sigmoid(out)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_groups", "eps", "silu", "interpret")
)
def fused_groupnorm(
    x: jax.Array,           # [B, H, W, C] or [B, S, C]
    scale: jax.Array,       # [C]
    bias: jax.Array,        # [C]
    num_groups: int = 32,
    eps: float = 1e-5,
    silu: bool = False,
    interpret: bool | None = None,
) -> jax.Array:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    orig_shape = x.shape
    b = x.shape[0]
    c = x.shape[-1]
    s = int(np.prod(x.shape[1:-1]))
    g = min(num_groups, c)
    assert c % g == 0
    xf = x.reshape(b, s, c)

    mask = jnp.asarray(
        np.kron(np.eye(g), np.ones((c // g, 1))), jnp.float32
    )                                                   # [C, G]
    maskT = mask.T.copy()
    scale2 = scale.astype(jnp.float32).reshape(1, c)
    bias2 = bias.astype(jnp.float32).reshape(1, c)

    out = pl.pallas_call(
        functools.partial(
            _gn_kernel, eps=eps, n_per_group=float(s * (c // g)), silu=silu
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, g), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, s, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, s, c), x.dtype),
        interpret=interpret,
    )(xf, mask, maskT, scale2, bias2)
    return out.reshape(orig_shape)
