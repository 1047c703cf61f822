"""Pallas fused kernel for the context-folded attention sub-layer.

``models/attention.CrossAttention._folded`` re-associates the flagship's
tiny cross-attention (``/root/reference/unet.py:164-279``, 42-token
char contexts) so the per-token work collapses to two full-width
matmuls against per-sample effective weights::

    wt = (Wq_h @ K_h^T) * scale      # [B, C, M], M = heads * L
    vw = V_h @ Wout_h                # [B, M, C]
    y  = x + softmax_per_head(LN(x) @ wt) @ vw + b_out

XLA runs that as separate kernels, writing the normed activation, the
[N, M] score matrix and the softmax back to HBM between matmuls. This
kernel chains the whole sub-layer — LayerNorm statistics, both matmuls,
the per-head softmax and the residual — in one VMEM residency per
batch element, the same "fuse the matmul chain XLA can't" structure
that made the FF kernel win (``ops/ffn_pallas.py``).

Numerics: bf16 matmul operands, fp32 MXU accumulation, fp32 LayerNorm,
softmax and residual — identical to the XLA folded path.

Falls back to interpret mode off-TPU so CPU tests exercise identical
semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fold_attn_kernel(
    x_ref, g_ref, b_ref, wt_ref, vw_ref, bo_ref, o_ref, *, heads: int, eps: float
):
    x = x_ref[0]                                     # [N, C]
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xn = (
        (xf - mu) * jax.lax.rsqrt(var + eps) * g_ref[:] + b_ref[:]
    ).astype(x.dtype)
    sim = jnp.dot(xn, wt_ref[0], preferred_element_type=jnp.float32)  # [N, M]
    m = sim.shape[-1]
    L = m // heads
    parts = []
    for h in range(heads):                           # static unroll
        s = sim[:, h * L:(h + 1) * L]
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        parts.append(e / jnp.sum(e, axis=-1, keepdims=True))
    p = jnp.concatenate(parts, axis=-1).astype(x.dtype)
    out = jnp.dot(p, vw_ref[0], preferred_element_type=jnp.float32)
    o_ref[0] = (xf + out + bo_ref[:]).astype(o_ref.dtype)


def fold_attn_fits_vmem(n: int, c: int, m: int, dtype_bytes: int = 2) -> bool:
    """Working-set guard: per-program blocks (double-buffered x/out,
    per-sample wt/vw, the fp32 score matrix) must fit VMEM."""
    tiles = (
        2 * n * c * dtype_bytes * 2          # x + out, double-buffered
        + 2 * (c * m + m * c) * dtype_bytes  # wt + vw, double-buffered
        + 2 * n * m * 4                      # sim f32 + softmax parts
        + n * c * 4                          # xf
    )
    return tiles <= 14 * 1024 * 1024


def _fold_attn_pallas(
    x: jax.Array,       # [B, N, C]
    gamma: jax.Array,   # [C] LayerNorm scale (fp32)
    beta: jax.Array,    # [C] LayerNorm bias (fp32)
    wt: jax.Array,      # [B, C, M] folded q-into-K weights (x.dtype)
    vw: jax.Array,      # [B, M, C] folded V-into-out weights (x.dtype)
    bo: jax.Array,      # [C] out-projection bias
    heads: int,
    eps: float = 1e-5,
    interpret: bool | None = None,
) -> jax.Array:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n, c = x.shape
    m = wt.shape[-1]
    row = lambda a: a.astype(jnp.float32).reshape(1, c)
    return pl.pallas_call(
        functools.partial(_fold_attn_kernel, heads=heads, eps=eps),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        interpret=interpret,
    )(x, row(gamma), row(beta), wt.astype(x.dtype), vw.astype(x.dtype), row(bo))


def _dot32(pattern: str, a: jax.Array, b: jax.Array) -> jax.Array:
    if jax.default_backend() == "tpu":
        return jnp.einsum(pattern, a, b, preferred_element_type=jnp.float32)
    return jnp.einsum(pattern, a.astype(jnp.float32), b.astype(jnp.float32))


def _fold_attn_reference(x, gamma, beta, wt, vw, bo, heads: int, eps: float = 1e-5):
    """Unfused composition with the kernel's dtype contract — the
    backward-pass recompute (and the CPU-correctness oracle)."""
    b, n, c = x.shape
    m = wt.shape[-1]
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xn = (
        (xf - mu) * jax.lax.rsqrt(var + eps) * gamma.astype(jnp.float32)
        + beta.astype(jnp.float32)
    ).astype(x.dtype)
    sim = _dot32("bnc,bcm->bnm", xn, wt.astype(x.dtype)).reshape(b, n, heads, -1)
    p = jax.nn.softmax(sim, axis=-1).astype(x.dtype).reshape(b, n, m)
    out = _dot32("bnm,bmc->bnc", p, vw.astype(x.dtype))
    return (xf + out + bo.astype(jnp.float32)).astype(x.dtype)


# ---------------------------------------------------------------------
# SPMD: batch dimension shards freely (each device runs the kernel on
# its local batch slice of x/wt/vw); LayerNorm/bias rows and the
# feature/score factors need replication. Under tensor parallelism the
# M = heads*L factor of wt/vw is head-aligned and could in principle
# shard with a psum on the output — not implemented; the partitioner
# gathers instead (the flagship runs attention TP through the unfused
# path, parallel/mesh.py rules).

from jax.experimental.custom_partitioning import (  # noqa: E402
    SdyShardingRule,
    custom_partitioning,
)
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

_FOLD_RULE = SdyShardingRule(
    (("b", "n", "c"), ("c1",), ("c2",), ("b", "c3", "m"), ("b", "m1", "c4"),
     ("c5",)),
    (("b", "n", "c"),),
    need_replication_factors=("n", "c", "c1", "c2", "c3", "m", "m1", "c4", "c5"),
)


def _batch_sharding(mesh, arg_shapes):
    spec = list(getattr(arg_shapes[0].sharding, "spec", ()) or ())
    return NamedSharding(mesh, P(spec[0] if spec else None, None, None))


def _fold_infer(*cb):
    mesh, arg_shapes = cb[-3], cb[-2]
    return _batch_sharding(mesh, arg_shapes)


def _fold_partition(*cb):
    static, mesh, arg_shapes = cb[:-3], cb[-3], cb[-2]
    xs = _batch_sharding(mesh, arg_shapes)
    rep = NamedSharding(mesh, P())

    def lower(x, gamma, beta, wt, vw, bo):
        return _fold_attn_pallas(x, gamma, beta, wt, vw, bo, *static)

    spec = getattr(xs, "spec", P(None))
    batch_axes = spec[0] if spec else None
    wt_s = NamedSharding(mesh, P(batch_axes, None, None))
    return mesh, lower, xs, (xs, rep, rep, wt_s, wt_s, rep)


_fold_cp = custom_partitioning(_fold_attn_pallas, static_argnums=(6, 7, 8))
_fold_cp.def_partition(
    partition=_fold_partition,
    infer_sharding_from_operands=_fold_infer,
    sharding_rule=_FOLD_RULE,
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def fused_fold_attention(
    x, gamma, beta, wt, vw, bo, heads, eps=1e-5, interpret=None
):
    """x + softmax_per_head(LayerNorm(x) @ wt) @ vw + bo as one Pallas
    kernel. Differentiable via XLA-recompute backward (grads flow to
    wt/vw and back through the XLA einsums that build them); SPMD-safe
    via the batch-sharded partitioning rule."""
    return _fold_cp(x, gamma, beta, wt, vw, bo, heads, eps, interpret)


def _fold_fwd(x, gamma, beta, wt, vw, bo, heads, eps, interpret):
    out = _fold_cp(x, gamma, beta, wt, vw, bo, heads, eps, interpret)
    return out, (x, gamma, beta, wt, vw, bo)


def _fold_bwd(heads, eps, interpret, res, g):
    _, vjp = jax.vjp(
        functools.partial(_fold_attn_reference, heads=heads, eps=eps), *res
    )
    return vjp(g)


fused_fold_attention.defvjp(_fold_fwd, _fold_bwd)
