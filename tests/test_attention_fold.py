"""Context-folded cross-attention parity (models/attention.py
CrossAttention._folded).

The fold re-associates the reference attention math
(``/root/reference/unet.py:164-279``): q projection folded into K,
out projection folded into V. Same result up to float reordering —
these tests pin fp32 near-exactness, bf16 closeness at the flagship
shapes, the auto-disable for large (PHOSC-sized) contexts, and
full-UNet agreement fold-on vs fold-off over identical params.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from worddiffusion_tpu.models.attention import CrossAttention


def _pair(dtype, heads=4, dim_head=80, L=42, ctx_dim=320):
    """Folded and reference modules sharing one param tree."""
    kw = dict(
        query_dim=heads * dim_head, context_dim=ctx_dim, heads=heads,
        dim_head=dim_head, dtype=dtype,
    )
    ref = CrossAttention(fold_context=False, **kw)
    fold = CrossAttention(fold_context=True, **kw)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 64, heads * dim_head), jnp.float32)
    ctx = jax.random.normal(jax.random.fold_in(rng, 1), (2, L, ctx_dim), jnp.float32)
    params = ref.init(jax.random.PRNGKey(2), x, ctx)
    return ref, fold, params, x, ctx


def test_folded_matches_reference_fp32():
    ref, fold, params, x, ctx = _pair(jnp.float32)
    a = ref.apply(params, x, ctx)
    b = fold.apply(params, x, ctx)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4)


def test_folded_param_tree_identical():
    ref, fold, params, x, ctx = _pair(jnp.float32)
    fold_params = fold.init(jax.random.PRNGKey(2), x, ctx)
    ref_tree = jax.tree.structure(params)
    fold_tree = jax.tree.structure(fold_params)
    assert ref_tree == fold_tree
    for (pa, a), (pb, bv) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(fold_params),
    ):
        assert pa == pb and a.shape == bv.shape


def test_folded_matches_reference_bf16():
    ref, fold, params, x, ctx = _pair(jnp.bfloat16)
    a = np.asarray(ref.apply(params, x, ctx), np.float32)
    b = np.asarray(fold.apply(params, x, ctx), np.float32)
    # one extra bf16 rounding of the folded effective weights
    scale = max(np.abs(a).max(), 1.0)
    assert np.abs(a - b).max() / scale < 4e-2


def test_folded_auto_disables_for_large_context():
    # heads * L > query_dim (the PHOSC regime): the folded module must
    # fall back to the reference association and agree bit-for-bit
    ref, fold, params, x, ctx = _pair(jnp.float32, L=100)
    assert 4 * 100 > 320
    a = ref.apply(params, x, ctx)
    b = fold.apply(params, x, ctx)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_folded_self_attention_falls_back():
    # context=None (WordStylist attn1): fold does not apply
    ref, fold, params, x, _ = _pair(jnp.float32)
    a = ref.apply(params, x, None)
    b = fold.apply(params, x, None)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_unet_fold_on_off_agree():
    from worddiffusion_tpu.configs.config import UNetConfig
    from worddiffusion_tpu.models.unet import UNet

    base = UNetConfig(
        model_channels=64, context_dim=64, num_heads=2, vocab_size=30,
        num_writers=4, max_seq_len=10, dtype="float32",
        attn_fold_context=False,
    )
    x = np.random.default_rng(0).normal(size=(2, 8, 32, 4)).astype(np.float32)
    t = np.array([3, 40], np.int32)
    ids = np.ones((2, 10), np.int32)
    wid = np.array([0, 1], np.int32)
    m_off = UNet(base)
    params = m_off.init(jax.random.PRNGKey(0), x, t, ids, wid)
    m_on = UNet(dataclasses.replace(base, attn_fold_context=True))
    a = m_off.apply(params, x, t, ids, wid)
    b = m_on.apply(params, x, t, ids, wid)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4)


def test_folded_grads_match_reference():
    ref, fold, params, x, ctx = _pair(jnp.float32)

    def loss(fn):
        return lambda p: jnp.sum(jnp.square(fn.apply(p, x, ctx)))

    ga = jax.grad(loss(ref))(params)
    gb = jax.grad(loss(fold))(params)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4
        )


# --- fused Pallas sub-layer kernel (bench_kernels/attn_fold_pallas.py, retired) ----------


def _kernel_args(dtype=jnp.float32, b=2, n=64, c=160, heads=4, L=10):
    rng = np.random.default_rng(0)
    m = heads * L
    x = jnp.asarray(rng.standard_normal((b, n, c)), dtype)
    gamma = jnp.asarray(1 + 0.05 * rng.standard_normal(c), jnp.float32)
    beta = jnp.asarray(0.05 * rng.standard_normal(c), jnp.float32)
    wt = jnp.asarray(0.1 * rng.standard_normal((b, c, m)), dtype)
    vw = jnp.asarray(0.1 * rng.standard_normal((b, m, c)), dtype)
    bo = jnp.asarray(0.05 * rng.standard_normal(c), jnp.float32)
    return x, gamma, beta, wt, vw, bo, heads


def test_fused_fold_kernel_matches_reference():
    from bench_kernels.attn_fold_pallas import (
        _fold_attn_reference,
        fused_fold_attention,
    )

    args = _kernel_args()
    out = fused_fold_attention(*args)
    ref = _fold_attn_reference(*args)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
    )


def test_fused_fold_kernel_bf16():
    from bench_kernels.attn_fold_pallas import (
        _fold_attn_reference,
        fused_fold_attention,
    )

    args = _kernel_args(jnp.bfloat16)
    out = np.asarray(fused_fold_attention(*args), np.float32)
    ref = np.asarray(_fold_attn_reference(*args), np.float32)
    assert np.abs(out - ref).max() < 3e-2


def test_fused_fold_kernel_grads():
    from bench_kernels.attn_fold_pallas import (
        _fold_attn_reference,
        fused_fold_attention,
    )

    x, gamma, beta, wt, vw, bo, heads = _kernel_args()

    def loss(f):
        return lambda x, wt, vw: jnp.sum(
            jnp.square(f(x, gamma, beta, wt, vw, bo, heads))
        )

    ga = jax.grad(loss(fused_fold_attention), argnums=(0, 1, 2))(x, wt, vw)
    gb = jax.grad(loss(_fold_attn_reference), argnums=(0, 1, 2))(x, wt, vw)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
        )


def test_block_fold_on_matches_fold_off():
    """BasicTransformerBlock with fold_context (the XLA-folded
    association) must agree with the plain reference block over one
    param tree — both research (attn1_cross) and WordStylist layouts.
    (The fused Pallas sub-layer variant of this path is retired to
    bench_kernels/ — measured slower, BENCHMARKS.md round 4.)"""
    from worddiffusion_tpu.models.attention import BasicTransformerBlock

    for attn1_cross in (True, False):
        kw = dict(
            dim=160, n_heads=4, d_head=40, context_dim=160,
            attn1_cross=attn1_cross, dtype=jnp.float32,
        )
        ref = BasicTransformerBlock(**kw)
        fold = BasicTransformerBlock(fold_context=True, **kw)
        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(rng, (2, 64, 160), jnp.float32)
        ctx = jax.random.normal(jax.random.fold_in(rng, 1), (2, 10, 160))
        params = ref.init(jax.random.PRNGKey(2), x, ctx)
        assert jax.tree.structure(params) == jax.tree.structure(
            fold.init(jax.random.PRNGKey(2), x, ctx)
        )
        a = ref.apply(params, x, ctx)
        b = fold.apply(params, x, ctx)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4,
            err_msg=f"attn1_cross={attn1_cross}",
        )
