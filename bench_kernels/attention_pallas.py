"""Pallas TPU fused attention for the UNet's small-sequence shapes.

The workload (SURVEY.md §3.5): Nq = 256 (8x32 latent tokens) or 64,
Nk <= ~820 (42 char tokens, optionally + 769 PHOSC pseudo-tokens),
head dim 80, 4 heads. Everything for one (batch, head) pair fits in
VMEM, so the kernel is a single-pass fused
``softmax(q k^T * scale) v`` with fp32 accumulation — no HBM
materialisation of the [Nq, Nk] score matrix, which is what the XLA
fallback pays for.

Falls back to interpret mode off-TPU so CPU tests exercise identical
semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)                 # [Nq, D]
    k = k_ref[0].astype(jnp.float32)                 # [Nk, D]
    v = v_ref[0]                                     # [Nk, D]
    sim = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                        # [Nq, Nk]
    sim = sim - jnp.max(sim, axis=-1, keepdims=True)
    p = jnp.exp(sim)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _fused_attention_impl(q, k, v, scale: float, interpret: bool):
    b, h, nq, d = q.shape
    nk = k.shape[2]
    qf = q.reshape(b * h, nq, d)
    kf = k.reshape(b * h, nk, d)
    vf = v.reshape(b * h, nk, d)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, nq, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, nq, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, nq, d), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, nq, d)


def fused_attention(q, k, v, scale: float):
    """softmax(q k^T * scale) v.  q: [B,H,Nq,D]; k,v: [B,H,Nk,D]."""
    interpret = jax.default_backend() != "tpu"
    return _fused_attention_impl(q, k, v, scale, interpret)
