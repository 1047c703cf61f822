"""Cross-attention, transformer block and spatial transformer.

TPU-native rewrite of ``unet.py:164-412`` / ``unetPhosc.py:157-300``:
attention runs as batched MXU matmuls with an fp32 softmax (a fused
Pallas attention kernel was measured slower at these shapes and is
retired to ``bench_kernels/`` — BENCHMARKS.md). Two block variants
exist as *static* config, not runtime flags:

- ``attn1_cross=True``  — the research UNet (``unet.py:337-341``) where
  BOTH attentions cross-attend to the text context through a shared
  pre-norm (norm2).
- ``attn1_cross=False`` — the WordStylist/phosc layout
  (``unetPhosc.py:224-246``): self-attn -> cross-attn -> FF.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Conv2D, Dense, FeedForward, GroupNorm32

Dtype = Any


def _einsum32(pattern: str, a: jax.Array, b: jax.Array) -> jax.Array:
    """bf16 x bf16 -> fp32 einsum. ``preferred_element_type`` on TPU
    (MXU-native); explicit upcast elsewhere — some CPU dot thunks lack
    mixed-output dots. Numerically identical either way: bf16 values
    are exact in fp32 and both forms accumulate in fp32."""
    if jax.default_backend() == "tpu":
        return jnp.einsum(pattern, a, b, preferred_element_type=jnp.float32)
    return jnp.einsum(pattern, a.astype(jnp.float32), b.astype(jnp.float32))


def fold_weights(context, wq, wk, wv, wo, heads, dim_head, query_dim, dtype):
    """Per-sample effective weights for context-folded attention
    (``CrossAttention._folded``): the q projection associated into K
    and the out projection into V::

        wt[b] = concat_h(Wq_h @ K_h[b]^T) * scale   # [B, C, H*L]
        vw[b] = concat_h(V_h[b] @ Wout_h)           # [B, H*L, C]
    """
    b, L, _ = context.shape
    c = wq.shape[0]
    scale = dim_head ** -0.5
    ctx = context.astype(dtype)
    kh = jnp.einsum("blc,cf->blf", ctx, wk.astype(dtype)).reshape(
        b, L, heads, dim_head
    )
    vh = jnp.einsum("blc,cf->blf", ctx, wv.astype(dtype)).reshape(
        b, L, heads, dim_head
    )
    wt = _einsum32(
        "chd,blhd->bchl", wq.astype(dtype).reshape(c, heads, dim_head), kh
    ) * scale
    wt = wt.astype(dtype).reshape(b, c, heads * L)
    vw = _einsum32(
        "blhd,hdf->bhlf", vh, wo.astype(dtype).reshape(heads, dim_head, query_dim)
    ).astype(dtype).reshape(b, heads * L, query_dim)
    return wt, vw


def _attend(
    q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
    fast_softmax: bool = False,
) -> jax.Array:
    """softmax(q k^T * scale) v with fp32 accumulation.

    q: [B, Nq, H, D], k/v: [B, Nk, H, D] — the head axis stays where the
    reshape from [B, N, H*D] put it and einsum contracts it in place.
    (Measured identical to the explicit [B,H,N,D] transpose form —
    XLA's layout assignment elides those copies either way; kept for
    simplicity. BENCHMARKS.md roofline notes.)

    ``fast_softmax``: keep the scores and the max-subtract in fp32 (the
    numerically fragile part) but run exp/normalise in bf16, halving
    the softmax intermediates' HBM traffic. Max relative drift vs the
    fp32 softmax is ~0.5% per attention (bf16 has ~3 decimal digits);
    gated by ``UNetConfig.fast_softmax``.
    """
    sim = jnp.einsum(
        "bihd,bjhd->bhij", q, k, preferred_element_type=jnp.float32
    ) * scale
    if fast_softmax:
        m = jnp.max(sim, axis=-1, keepdims=True)
        e = jnp.exp(sim - m).astype(v.dtype)
        attn = e / jnp.sum(
            e, axis=-1, keepdims=True, dtype=jnp.float32
        ).astype(v.dtype)
    else:
        attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
    return jnp.einsum(
        "bhij,bjhd->bihd", attn, v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)


class CrossAttention(nn.Module):
    """Multi-head cross attention (``unet.py:164-279`` minus the
    experiment hooks). No q/k/v biases; output projection has bias.

    ``fold_context`` enables the context-folded evaluation for small
    cross-attention contexts (the flagship's 42 char tokens,
    ``unet.py:337-341``): instead of projecting queries and attending
    per head — [Nq,80]x[80,42] MXU slivers at ~20% utilisation — the
    query projection is associated into K and the output projection
    into V::

        sim_h = (x Wq_h) K_h^T          =  x (Wq_h K_h^T)
        out   = (P_h V_h) Wout_h        =  P_h (V_h Wout_h)

    so the two per-token matmuls become [Nq,C]x[C,H*L] and
    [Nq,H*L]x[H*L,C] with full 320-deep contractions, and the two C x C
    projection matmuls disappear into L-sized ones. For H*L < C this is
    both fewer MACs (~45M vs ~68M per sample at the flagship shape) and
    far better MXU shapes. Same math, different association — applied
    only when ``heads * L <= query_dim`` (it inflates work for large
    contexts such as PHOSC's 811 tokens, where the path auto-disables).

    MEASURED NEGATIVE at the flagship shape (BENCHMARKS.md round 4):
    the per-sample effective weights are ~27 MB/layer/call of extra
    HBM traffic at B=128, which outweighs the MAC savings on the
    HBM-bound sampler (113.5 vs 113.6 imgs/s) and train step (38.9 vs
    37.2 ms). Default off; explicit opt-in for compute-bound shapes.
    """

    query_dim: int
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    dtype: Dtype = jnp.bfloat16
    fold_context: bool = False
    sow_attn: bool = False
    fast_softmax: bool = False

    def _folded(self, x, context, to_q, to_k, to_v, to_out, deterministic):
        b, nq, c = x.shape
        L = context.shape[1]
        h, d = self.heads, self.dim_head
        # materialise the (identical) param tree without running the
        # unfused projections — dead code under jit
        to_q(jnp.zeros((1, 1, c), self.dtype))
        to_k(jnp.zeros((1, 1, context.shape[-1]), self.dtype))
        to_v(jnp.zeros((1, 1, context.shape[-1]), self.dtype))
        to_out(jnp.zeros((1, 1, h * d), self.dtype))
        wq = to_q.variables["params"]["Dense_0"]["kernel"]
        wk = to_k.variables["params"]["Dense_0"]["kernel"]
        wv = to_v.variables["params"]["Dense_0"]["kernel"]
        wo = to_out.variables["params"]["Dense_0"]["kernel"]
        bo = to_out.variables["params"]["Dense_0"]["bias"].astype(self.dtype)

        wt, vw = fold_weights(
            context, wq, wk, wv, wo, h, d, self.query_dim, self.dtype
        )
        sim = _einsum32("bnc,bcm->bnm", x.astype(self.dtype), wt)
        sim = sim.reshape(b, nq, h, L)
        p = jax.nn.softmax(sim, axis=-1).astype(self.dtype).reshape(b, nq, h * L)
        out = _einsum32("bnm,bmf->bnf", p, vw).astype(self.dtype) + bo
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        inner = self.heads * self.dim_head
        to_q = Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")
        to_k = Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")
        to_v = Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")
        to_out = Dense(self.query_dim, dtype=self.dtype, name="to_out")
        if (
            self.fold_context
            and not self.sow_attn
            and context is not None
            and self.heads * context.shape[1] <= self.query_dim
        ):
            return self._folded(
                x, context, to_q, to_k, to_v, to_out, deterministic
            )
        context = x if context is None else context
        q = to_q(x)
        k = to_k(context)
        v = to_v(context)

        b, nq, _ = q.shape
        nk = k.shape[1]
        q = q.reshape(b, nq, self.heads, self.dim_head)
        k = k.reshape(b, nk, self.heads, self.dim_head)
        v = v.reshape(b, nk, self.heads, self.dim_head)

        if self.sow_attn:
            # attention-map return option (reference --attentionMaps,
            # ``unet.py:208-279``): expose [B, heads, Nq, Nk] via the
            # flax 'intermediates' collection
            sim = jnp.einsum(
                "bihd,bjhd->bhij", q, k, preferred_element_type=jnp.float32
            ) * (self.dim_head ** -0.5)
            attn = jax.nn.softmax(sim, axis=-1)
            self.sow("intermediates", "attn", attn)
            out = jnp.einsum(
                "bhij,bjhd->bihd", attn.astype(v.dtype), v,
                preferred_element_type=jnp.float32,
            ).astype(v.dtype)
        else:
            out = _attend(
                q, k, v, self.dim_head ** -0.5,
                fast_softmax=self.fast_softmax,
            )
        out = out.reshape(b, nq, inner)
        out = to_out(out)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class BasicTransformerBlock(nn.Module):
    dim: int
    n_heads: int
    d_head: int
    context_dim: Optional[int] = None
    dropout: float = 0.0
    attn1_cross: bool = True
    dtype: Dtype = jnp.bfloat16
    use_pallas_ffn: bool = False
    fold_context: bool = False
    sow_attn: bool = False
    fast_softmax: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        def ln(name):
            # epsilon 1e-5 = torch LayerNorm default (checkpoint parity)
            return nn.LayerNorm(
                epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32,
                name=name,
            )

        attn1 = CrossAttention(
            query_dim=self.dim,
            context_dim=self.context_dim if self.attn1_cross else None,
            heads=self.n_heads,
            dim_head=self.d_head,
            dropout=self.dropout,
            dtype=self.dtype,
            fold_context=self.fold_context,
            sow_attn=self.sow_attn,
            fast_softmax=self.fast_softmax,
            name="attn1",
        )
        attn2 = CrossAttention(
            query_dim=self.dim,
            context_dim=self.context_dim,
            heads=self.n_heads,
            dim_head=self.d_head,
            dropout=self.dropout,
            dtype=self.dtype,
            fold_context=self.fold_context,
            sow_attn=self.sow_attn,
            fast_softmax=self.fast_softmax,
            name="attn2",
        )
        ff = FeedForward(
            self.dim, dropout=self.dropout, dtype=self.dtype, name="ff",
        )

        if self.attn1_cross:
            # research UNet: both attentions see the context, shared norm2
            norm2 = ln("norm2")
            h = norm2(x).astype(self.dtype)
            x = x + attn1(h, context, deterministic)
            h = norm2(x).astype(self.dtype)
            x = x + attn2(h, context, deterministic)
        else:
            x = x + attn1(ln("norm1")(x).astype(self.dtype), None, deterministic)
            x = x + attn2(ln("norm2")(x).astype(self.dtype), context, deterministic)

        norm3 = ln("norm3")
        from ..ops.ffn_pallas import fits_vmem, fused_ln_geglu_ffn

        # Fused path needs inert dropout (rate 0 or deterministic
        # inference) and feature dims whose working set fits VMEM;
        # otherwise fall back to the numerically-identical unfused path.
        use_fused = (
            self.use_pallas_ffn
            and (self.dropout == 0.0 or deterministic)
            and fits_vmem(self.dim, 4 * self.dim)
        )
        if use_fused:
            # Whole FF sub-layer (LN + GEGLU matmul chain + residual) as
            # one Pallas kernel. The unfused modules are still declared
            # with dummy rows (dead code under jit) so the param tree —
            # and therefore checkpoint interop — is identical.

            norm3(jnp.zeros((1, self.dim), jnp.float32))
            ff(jnp.zeros((1, 1, self.dim), self.dtype), deterministic)
            ln_p = norm3.variables["params"]
            ff_p = ff.variables["params"]
            p1 = ff_p["GEGLU_0"]["Dense_0"]["Dense_0"]
            p2 = ff_p["Dense_0"]["Dense_0"]
            return fused_ln_geglu_ffn(
                x, ln_p["scale"], ln_p["bias"],
                p1["kernel"], p1["bias"], p2["kernel"], p2["bias"],
            )
        return x + ff(norm3(x).astype(self.dtype), deterministic)


class SpatialTransformer(nn.Module):
    """GroupNorm -> 1x1 conv in -> token transformer -> 1x1 zero conv out
    + residual (``unet.py:347-412``)."""

    in_channels: int
    n_heads: int
    d_head: int
    depth: int = 1
    context_dim: Optional[int] = None
    dropout: float = 0.0
    attn1_cross: bool = True
    dtype: Dtype = jnp.bfloat16
    use_pallas_ffn: bool = False
    fold_context: bool = False
    sow_attn: bool = False
    fast_softmax: bool = False
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        b, h, w, c = x.shape
        inner = self.n_heads * self.d_head
        x_in = x
        x = GroupNorm32(name="norm")(x)
        x = Conv2D(inner, kernel=(1, 1), dtype=self.dtype, name="proj_in")(x)
        x = x.reshape(b, h * w, inner)

        block_cls = BasicTransformerBlock
        if self.remat:
            block_cls = nn.remat(BasicTransformerBlock, static_argnums=(3,))
        for i in range(self.depth):
            x = block_cls(
                dim=inner,
                n_heads=self.n_heads,
                d_head=self.d_head,
                context_dim=self.context_dim,
                dropout=self.dropout,
                attn1_cross=self.attn1_cross,
                dtype=self.dtype,
                use_pallas_ffn=self.use_pallas_ffn,
                fold_context=self.fold_context,
                sow_attn=self.sow_attn,
                fast_softmax=self.fast_softmax,
                name=f"block_{i}",
            )(x, context, deterministic)

        x = x.reshape(b, h, w, inner)
        x = Conv2D(
            self.in_channels, kernel=(1, 1), zero_init=True, dtype=self.dtype,
            name="proj_out",
        )(x)
        return x + x_in
