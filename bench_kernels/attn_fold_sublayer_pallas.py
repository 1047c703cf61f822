"""Pallas fused fold-attention kernel (cross-attention sub-layer) —
MEASURED NEGATIVE, retired (round 5).

Idle-v5e measurement, flagship chained-50 denoiser call, B=128, fused
FFN + fast_softmax on: kernel OFF 9.234 ms/call, kernel ON 12.535
(+36%). The per-(sample,head) [256,320]x[320,42] score matmuls and
[256,42]x[42,320] AV matmuls underfill the MXU lanes (L=42 of 128) and
serialise 32 small contractions per program, which costs far more than
the HBM round-trips they remove — the same failure mode as the round-1
per-(batch,head) attention kernel and the round-4 per-sample fold
sub-layer kernel (100.1 vs 113.6 imgs/s). This completes the
attention-kernel matrix: XLA fold (neutral), per-sample folded-matmul
kernel (-12%), per-head fold kernel with LN+residual fused (-36%) —
at B=128 with a 42-token context, XLA's fully batched einsums are the
frontier. Kept correct + tested (tests/test_pallas_ops.py,
tests/test_sharding.py) per the bench_kernels/ policy.

Original design notes:

The flagship's attentions are all CROSS attentions over the tiny
42-token char context (``attn1_cross=True`` research quirk,
``/root/reference/unet.py:337-341``): per call the unfused path pays
the LayerNorm round-trip, two full C x C projections (to_q, to_out),
per-(batch,head) [N,80]x[80,42] MXU slivers, and materialises the
[B,H,N,L] scores + probs to HBM between every op — the time
decomposition (docs/denoiser_time_decomposition.json) attributes
~1.8 ms of the 9.05 ms denoiser call to this stack.

This kernel runs the whole sub-layer per attention in one program::

    out = x + sum_h softmax(LN(x) @ wt_h) @ vw_h + b_out

where ``wt_h = Wq_h K_h^T * scale`` ([C, L] per sample/head) and
``vw_h = V_h Wout_h`` ([L, C]) are the context-folded effective
weights (models/attention.fold_weights — same association the round-4
``attn_fold_context`` experiment measured; THAT lost because XLA
materialised the per-sample weights and scores to HBM, which a VMEM
residency makes free). The q/out projections disappear into the folds
(built once per call from the 42-token context — ~2 GFLOP vs the
13.4 GFLOP of to_q+to_out they replace), scores and probs never leave
VMEM, and the LN + residual ride along.

Grid: one program per batch tile (``block_b`` samples); per sample and
head two MXU matmuls ([N,C]x[C,L] scores with the full 320-deep
contraction, [N,L]x[L,C] back) and an fp32 VPU softmax over the
logical L columns. Applies only when ``heads * L <= query_dim`` (the
same gate as ``attn_fold_context`` — PHOSC's 811-token contexts
auto-disable).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import (
    SdyShardingRule,
    custom_partitioning,
)
from jax.sharding import NamedSharding, PartitionSpec as P

VMEM_BUDGET = 96 * 1024 * 1024  # leave headroom under the 128 MB v5e VMEM


def _dot32(a, b, upcast: bool):
    """bf16 x bf16 -> f32 dot; CPU dot thunks lack the mixed form, so
    off-TPU (and in interpret mode) the operands upcast first —
    numerically identical, bf16 values are exact in fp32."""
    if upcast:
        return jnp.dot(a.astype(jnp.float32), b.astype(jnp.float32))
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _einsum32(pattern, a, b):
    if jax.default_backend() == "tpu":
        return jnp.einsum(pattern, a, b, preferred_element_type=jnp.float32)
    return jnp.einsum(pattern, a.astype(jnp.float32), b.astype(jnp.float32))


def fold_attention_reference(x, wt4, vw4, gamma, beta, bo, eps=1e-5):
    """Unfused XLA composition of the kernel's math — interpret-mode
    fallback, custom_vjp recompute backward, and the parity oracle.

    x: [B, N, C] bf16; wt4: [B, H, C, L]; vw4: [B, H, L, C];
    gamma/beta/bo: [C] fp32.
    """
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xn = ((xf - mu) * jax.lax.rsqrt(var + eps) * gamma + beta).astype(x.dtype)
    sc = _einsum32("bnc,bhcl->bhnl", xn, wt4)
    p = jax.nn.softmax(sc, axis=-1).astype(x.dtype)
    o = _einsum32("bhnl,bhlc->bnc", p, vw4)
    return (xf + o + bo).astype(x.dtype)


def _fold_attn_kernel(
    x_ref, wt_ref, vw_ref, g_ref, b_ref, bo_ref, o_ref,
    *, block_b: int, heads: int, eps: float, upcast: bool,
):
    xv = x_ref[...]                                     # [bb, N, C] bf16
    xf = xv.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xn = ((xf - mu) * jax.lax.rsqrt(var + eps) * g_ref[:] + b_ref[:]).astype(
        xv.dtype
    )
    for s in range(block_b):
        acc = None
        for h in range(heads):
            sc = _dot32(xn[s], wt_ref[s, h], upcast)     # [N, L]
            m = jnp.max(sc, axis=-1, keepdims=True)
            e = jnp.exp(sc - m)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(xv.dtype)
            o = _dot32(p, vw_ref[s, h], upcast)          # [N, C]
            acc = o if acc is None else acc + o
        o_ref[s] = (xf[s] + acc + bo_ref[:]).astype(o_ref.dtype)


def pick_block_b(b: int, n: int, c: int, heads: int, l: int,
                 block_b: int = 8) -> int | None:
    """Largest batch tile (<= block_b, divides b) whose VMEM working
    set fits: double-buffered x/out tiles + wt/vw tiles + the xn copy
    + one [N, L] fp32 score block."""
    bb = min(block_b, b)
    while bb >= 1:
        if b % bb == 0:
            tiles = (
                2 * 2 * bb * n * c * 2          # x + out, double-buffered
                + 2 * 2 * bb * heads * c * l * 2  # wt + vw, double-buffered
                + bb * n * c * 2                # xn
                + n * l * 4 * 2                 # score + exp blocks
            )
            if tiles <= VMEM_BUDGET:
                return bb
        bb -= 1
    return None


def _fold_attn_pallas(
    x, wt4, vw4, gamma, beta, bo, block_b, eps, interpret,
):
    b, n, c = x.shape
    heads, l = wt4.shape[1], wt4.shape[3]
    bb = pick_block_b(b, n, c, heads, l, block_b)
    if bb is None:
        return fold_attention_reference(x, wt4, vw4, gamma, beta, bo, eps)
    if interpret:
        bb = min(bb, 2)  # keep the unrolled interpret loops small
    grid = (b // bb,) if b % bb == 0 else None
    if grid is None:
        return fold_attention_reference(x, wt4, vw4, gamma, beta, bo, eps)
    return pl.pallas_call(
        functools.partial(
            _fold_attn_kernel, block_b=bb, heads=heads, eps=eps,
            upcast=bool(interpret),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, heads, c, l), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, heads, l, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        interpret=interpret,
    )(x, wt4, vw4, gamma.reshape(1, c), beta.reshape(1, c),
      bo.reshape(1, c))


# --- SPMD: batch shards freely and ties x/wt/vw together; every other
# factor needs replication (the folds are per-sample, so dp sharding
# runs the kernel shard-local with zero collectives, like the FFN op).
_FOLD_ATTN_RULE = SdyShardingRule(
    (
        ("b", "n", "c"),
        ("b", "h", "c1", "l"),
        ("b", "h1", "l1", "c2"),
        ("c3",), ("c4",), ("c5",),
    ),
    (("b", "n", "c"),),
    need_replication_factors=(
        "n", "c", "h", "c1", "l", "h1", "l1", "c2", "c3", "c4", "c5",
    ),
)


def _batch_sharding(mesh, arg_shapes, ndim):
    spec = list(getattr(arg_shapes[0].sharding, "spec", ()) or ())
    axis = spec[0] if spec else None
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


_fold_attn_cp = custom_partitioning(
    _fold_attn_pallas, static_argnums=(6, 7, 8)
)


def _fa_infer(*cb):
    mesh, arg_shapes = cb[-3], cb[-2]
    return _batch_sharding(mesh, arg_shapes, 3)


def _fa_partition(*cb):
    static, mesh, arg_shapes = cb[:-3], cb[-3], cb[-2]
    xs = _batch_sharding(mesh, arg_shapes, 3)
    wt_s = _batch_sharding(mesh, arg_shapes, 4)
    rep = NamedSharding(mesh, P())

    def lower(*tensors):
        return _fold_attn_pallas(*tensors, *static)

    return mesh, lower, xs, (xs, wt_s, wt_s, rep, rep, rep)


_fold_attn_cp.def_partition(
    partition=_fa_partition,
    infer_sharding_from_operands=_fa_infer,
    sharding_rule=_FOLD_ATTN_RULE,
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def fused_fold_attention(
    x, wt4, vw4, gamma, beta, bo, block_b=8, eps=1e-5, interpret=None,
):
    """out = x + sum_h softmax(LN(x) @ wt_h) @ vw_h + b_out, one Pallas
    program per batch tile (see module docstring).

    x [B,N,C] bf16; wt4 [B,H,C,L] (pre-scaled folds); vw4 [B,H,L,C];
    gamma/beta/bo [C] fp32. ``interpret=None`` auto-falls back to the
    XLA composition off-TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _fold_attn_cp(x, wt4, vw4, gamma, beta, bo, block_b, eps,
                         interpret)


def _fa_fwd(x, wt4, vw4, gamma, beta, bo, block_b, eps, interpret):
    out = fused_fold_attention(
        x, wt4, vw4, gamma, beta, bo, block_b, eps, interpret
    )
    return out, (x, wt4, vw4, gamma, beta, bo)


def _fa_bwd(block_b, eps, interpret, res, g):
    # recompute backward through the unfused composition (the FFN
    # kernel's adopted policy: Trainer runs the unfused path anyway;
    # this keeps the op differentiable for ad-hoc grads)
    x, wt4, vw4, gamma, beta, bo = res
    _, vjp = jax.vjp(
        lambda *a: fold_attention_reference(*a, eps=eps),
        x, wt4, vw4, gamma, beta, bo,
    )
    return vjp(g)


fused_fold_attention.defvjp(_fa_fwd, _fa_bwd)


def build_folds(context, wq, wk, wv, wo, heads, dim_head, dtype):
    """Per-sample folded weights in the kernel's [B, H, ...] layout.

    Same association as ``models.attention.fold_weights`` (cited there)
    but emitted head-major so the kernel indexes [s, h] contiguously.
    Returns wt4 [B, H, C, L] (scaled) and vw4 [B, H, L, C].
    """
    b, L, _ = context.shape
    c = wq.shape[0]
    ctx = context.astype(dtype)
    kh = jnp.einsum("blc,cf->blf", ctx, wk.astype(dtype)).reshape(
        b, L, heads, dim_head
    )
    vh = jnp.einsum("blc,cf->blf", ctx, wv.astype(dtype)).reshape(
        b, L, heads, dim_head
    )
    wt4 = _einsum32(
        "chd,blhd->bhcl", wq.astype(dtype).reshape(c, heads, dim_head), kh
    ) * (dim_head ** -0.5)
    vw4 = _einsum32(
        "blhd,hdf->bhlf", vh,
        wo.astype(dtype).reshape(heads, dim_head, wo.shape[-1]),
    )
    return wt4.astype(dtype), vw4.astype(dtype)
