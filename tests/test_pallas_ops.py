"""Pallas kernel correctness (interpret mode on CPU; same kernel code
compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from bench_kernels.attention_pallas import fused_attention


def _xla_attention(q, k, v, scale):
    sim = jnp.einsum("bhid,bhjd->bhij", q, k,
                     preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(sim, axis=-1)
    return jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def test_fused_attention_matches_xla_small():
    rng = jax.random.PRNGKey(0)
    b, h, nq, nk, d = 2, 4, 256, 43, 80
    q = jax.random.normal(rng, (b, h, nq, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(rng, 1), (b, h, nk, d), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(rng, 2), (b, h, nk, d), jnp.float32)
    scale = d ** -0.5
    out_p = fused_attention(q, k, v, scale)
    out_x = _xla_attention(q, k, v, scale)
    assert np.allclose(np.asarray(out_p), np.asarray(out_x), atol=2e-5)


def test_fused_attention_phosc_context():
    rng = jax.random.PRNGKey(3)
    b, h, nq, nk, d = 1, 4, 64, 811, 80
    q = jax.random.normal(rng, (b, h, nq, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(rng, 1), (b, h, nk, d), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(rng, 2), (b, h, nk, d), jnp.float32)
    out_p = fused_attention(q, k, v, d ** -0.5)
    out_x = _xla_attention(q, k, v, d ** -0.5)
    assert np.allclose(np.asarray(out_p), np.asarray(out_x), atol=2e-5)


def test_fused_attention_bf16():
    rng = jax.random.PRNGKey(5)
    b, h, nq, nk, d = 1, 2, 32, 16, 8
    q = jax.random.normal(rng, (b, h, nq, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(rng, 1), (b, h, nk, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(rng, 2), (b, h, nk, d), jnp.bfloat16)
    out_p = fused_attention(q, k, v, d ** -0.5)
    out_x = _xla_attention(q, k, v, d ** -0.5)
    assert out_p.dtype == jnp.bfloat16
    assert np.allclose(
        np.asarray(out_p, np.float32), np.asarray(out_x, np.float32), atol=0.05
    )


def test_fused_groupnorm_matches_reference():
    from bench_kernels.groupnorm_pallas import fused_groupnorm

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 8, 32, 320), jnp.float32) * 2 + 0.5
    scale = jax.random.normal(jax.random.fold_in(rng, 1), (320,))
    bias = jax.random.normal(jax.random.fold_in(rng, 2), (320,))

    def ref(x):
        xg = x.reshape(2, 8 * 32, 32, 10)
        mu = xg.mean(axis=(1, 3), keepdims=True)
        var = xg.var(axis=(1, 3), keepdims=True)
        out = (xg - mu) / jnp.sqrt(var + 1e-5)
        return out.reshape(x.shape) * scale + bias

    out = fused_groupnorm(x, scale, bias, num_groups=32)
    assert np.allclose(np.asarray(out), np.asarray(ref(x)), atol=2e-4)

    out_silu = fused_groupnorm(x, scale, bias, num_groups=32, silu=True)
    expect = np.asarray(jax.nn.silu(ref(x)))
    assert np.allclose(np.asarray(out_silu), expect, atol=2e-4)


def test_fused_groupnorm_bf16():
    from bench_kernels.groupnorm_pallas import fused_groupnorm

    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (1, 4, 16, 64), jnp.bfloat16)
    out = fused_groupnorm(x, jnp.ones((64,)), jnp.zeros((64,)), num_groups=32, silu=True)
    assert out.dtype == jnp.bfloat16
    assert np.all(np.isfinite(np.asarray(out, np.float32)))


def test_fused_geglu_ffn_matches_xla():
    from worddiffusion_tpu.ops.ffn_pallas import _xla_baseline, fused_geglu_ffn

    rng = jax.random.PRNGKey(0)
    d, inner = 320, 1280
    x = jax.random.normal(rng, (2, 256, d), jnp.float32)
    w1 = jax.random.normal(jax.random.fold_in(rng, 1), (d, 2 * inner)) * 0.02
    b1 = jax.random.normal(jax.random.fold_in(rng, 2), (2 * inner,)) * 0.02
    w2 = jax.random.normal(jax.random.fold_in(rng, 3), (inner, d)) * 0.02
    b2 = jax.random.normal(jax.random.fold_in(rng, 4), (d,)) * 0.02
    out = np.asarray(fused_geglu_ffn(x, w1, b1, w2, b2), np.float32)
    ref = np.asarray(_xla_baseline(x, w1, b1, w2, b2), np.float32)
    assert out.shape == ref.shape
    assert np.abs(out - ref).max() < 2e-4


def test_fused_ln_geglu_ffn_matches_composition():
    """x + FFN(LN(x)) fused == f32 LayerNorm -> unfused FFN -> residual."""
    from worddiffusion_tpu.ops.ffn_pallas import _xla_baseline, fused_ln_geglu_ffn

    rng = jax.random.PRNGKey(11)
    d, inner = 128, 512
    x = jax.random.normal(rng, (3, 64, d), jnp.float32) * 2 + 0.3
    g = 1 + 0.1 * jax.random.normal(jax.random.fold_in(rng, 1), (d,))
    be = 0.1 * jax.random.normal(jax.random.fold_in(rng, 2), (d,))
    w1 = jax.random.normal(jax.random.fold_in(rng, 3), (d, 2 * inner)) * 0.02
    b1 = jax.random.normal(jax.random.fold_in(rng, 4), (2 * inner,)) * 0.02
    w2 = jax.random.normal(jax.random.fold_in(rng, 5), (inner, d)) * 0.02
    b2 = jax.random.normal(jax.random.fold_in(rng, 6), (d,)) * 0.02

    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    xn = (x - mu) / jnp.sqrt(var + 1e-5) * g + be
    ref = x + _xla_baseline(xn, w1, b1, w2, b2)

    out = fused_ln_geglu_ffn(x, g, be, w1, b1, w2, b2)
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 5e-4


def test_fused_geglu_ffn_bf16_and_padding():
    """bf16 path + an M that is not a multiple of the row tile."""
    from worddiffusion_tpu.ops.ffn_pallas import _xla_baseline, fused_geglu_ffn

    rng = jax.random.PRNGKey(7)
    d, inner, m = 64, 256, 100  # m=100 forces the pad-and-slice path
    x = jax.random.normal(rng, (m, d), jnp.bfloat16)
    w1 = jax.random.normal(jax.random.fold_in(rng, 1), (d, 2 * inner)) * 0.05
    b1 = jax.random.normal(jax.random.fold_in(rng, 2), (2 * inner,)) * 0.05
    w2 = jax.random.normal(jax.random.fold_in(rng, 3), (inner, d)) * 0.05
    b2 = jax.random.normal(jax.random.fold_in(rng, 4), (d,)) * 0.05
    out = fused_geglu_ffn(x, w1, b1, w2, b2, block_m=64)
    assert out.dtype == jnp.bfloat16
    ref = _xla_baseline(x, w1, b1, w2, b2)
    assert np.allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=0.05
    )


def test_fused_gn_silu_conv3x3_matches_xla():
    """Mega-kernel (interpret mode on CPU) vs the XLA GN->SiLU->conv
    reference at a small shape."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench_kernels.resblock_pallas import (
        fused_gn_silu_conv3x3,
        xla_reference,
    )

    key = jax.random.PRNGKey(0)
    B, H, W, C = 2, 8, 32, 64
    x = jax.random.normal(key, (B, H, W, C), jnp.float32)
    gs = jnp.asarray(np.random.default_rng(1).normal(1, 0.1, C), jnp.float32)
    gb = jnp.asarray(np.random.default_rng(2).normal(0, 0.1, C), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, C, C)) * 0.05
    b = jnp.asarray(np.random.default_rng(3).normal(0, 0.1, C), jnp.float32)

    ref = np.asarray(xla_reference(x, gs, gb, w, b), np.float32)
    out = np.asarray(
        fused_gn_silu_conv3x3(x, gs, gb, w, b, interpret=True), np.float32
    )
    assert out.shape == ref.shape
    # bf16 matmul operands in the kernel: tolerance at bf16 resolution
    assert np.abs(out - ref).max() < 0.05
    assert np.corrcoef(out.ravel(), ref.ravel())[0, 1] > 0.999


def test_fused_ffn_kernels_are_differentiable():
    """Training differentiates through the UNet: the custom_vjp
    (pallas forward, XLA-recompute backward) must match the unfused
    composition's gradients."""
    from worddiffusion_tpu.ops.ffn_pallas import (
        _ln_ffn_reference,
        _xla_baseline,
        fused_geglu_ffn,
        fused_ln_geglu_ffn,
    )

    d, inner = 32, 64
    rng = jax.random.PRNGKey(0)
    shapes = [(8, d), (d,), (d,), (d, 2 * inner), (2 * inner,), (inner, d), (d,)]
    args = [
        jax.random.normal(jax.random.fold_in(rng, i), s)
        for i, s in enumerate(shapes)
    ]
    g1 = jax.grad(
        lambda *a: jnp.sum(fused_ln_geglu_ffn(*a)), argnums=tuple(range(7))
    )(*args)
    g2 = jax.grad(
        lambda *a: jnp.sum(_ln_ffn_reference(*a)), argnums=tuple(range(7))
    )(*args)
    for a, b in zip(g1, g2):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    a2 = args[:1] + args[3:]
    h1 = jax.grad(
        lambda *a: jnp.sum(fused_geglu_ffn(*a)), argnums=tuple(range(5))
    )(*a2)
    h2 = jax.grad(
        lambda *a: jnp.sum(_xla_baseline(*a)), argnums=tuple(range(5))
    )(*a2)
    for a, b in zip(h1, h2):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fused_ffn_kernel_backward_grad_parity():
    """The fused Pallas BACKWARD kernel (fused_ln_geglu_ffn_kbwd — a
    measured negative at the flagship shape, kept correct for shapes
    where it may win) must produce the same gradients as the unfused
    composition, for every input, including an M that exercises the
    zero-padded tail rows."""
    from worddiffusion_tpu.ops.ffn_pallas import (
        _ln_ffn_reference,
        fused_ln_geglu_ffn_kbwd,
    )

    d, inner, m = 32, 64, 23  # m=23 forces pad rows in the bwd grid
    rng = jax.random.PRNGKey(2)
    shapes = [(m, d), (d,), (d,), (d, 2 * inner), (2 * inner,), (inner, d), (d,)]
    args = [
        (1.0 if i == 0 else 0.05) * jax.random.normal(jax.random.fold_in(rng, i), s)
        for i, s in enumerate(shapes)
    ]
    co = jax.random.normal(jax.random.fold_in(rng, 9), (m, d))
    g1 = jax.grad(
        lambda *a: jnp.sum(fused_ln_geglu_ffn_kbwd(*a, block_m=8) * co),
        argnums=tuple(range(7)),
    )(*args)
    g2 = jax.grad(
        lambda *a: jnp.sum(_ln_ffn_reference(*a) * co), argnums=tuple(range(7))
    )(*args)
    for a, b in zip(g1, g2):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_ffn_vmem_block_picker():
    from worddiffusion_tpu.ops.ffn_pallas import fits_vmem, pick_block_m

    # flagship shape fits at the full tile
    assert pick_block_m(320, 1280, m=32768) == 512
    # a 2x-wide transformer still fits at a reduced tile
    bm = pick_block_m(640, 2560, m=32768)
    assert bm is not None and bm < 512
    assert fits_vmem(640, 2560)
    # absurd width: no tile fits -> model layer must fall back
    assert pick_block_m(8192, 32768, m=1024) is None
    assert not fits_vmem(8192, 32768)


def test_ffn_dropout_model_fuses_at_inference():
    """A dropout>0 model must still take the (numerically inert) fused
    path when deterministic=True — and must NOT diverge from the
    unfused path there."""
    from worddiffusion_tpu.models.attention import BasicTransformerBlock

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 64, 32))
    ctx = jax.random.normal(jax.random.fold_in(rng, 1), (2, 5, 32))
    mk = lambda pallas: BasicTransformerBlock(
        dim=32, n_heads=4, d_head=8, context_dim=32, dropout=0.1,
        dtype=jnp.float32, use_pallas_ffn=pallas,
    )
    params = mk(False).init(rng, x, ctx, True)
    out_off = mk(False).apply(params, x, ctx, True)
    out_on = mk(True).apply(params, x, ctx, True)
    assert np.allclose(np.asarray(out_on), np.asarray(out_off), atol=5e-5)


# --- fused fold-attention sub-layer (ops/attn_pallas.py) -------------


def _fold_attn_inputs(B=4, N=16, C=64, H=4, L=10, seed=0):
    D = C // H
    k = jax.random.PRNGKey(seed)
    x = jax.random.normal(k, (B, N, C), jnp.bfloat16)
    ctx = jax.random.normal(jax.random.fold_in(k, 1), (B, L, C), jnp.bfloat16)
    ws = [
        0.1 * jax.random.normal(jax.random.fold_in(k, i), (C, C), jnp.float32)
        for i in range(2, 6)
    ]
    gamma = jnp.ones((C,), jnp.float32) + 0.1
    beta = jnp.full((C,), 0.05, jnp.float32)
    bo = jnp.full((C,), 0.02, jnp.float32)
    return x, ctx, ws, gamma, beta, bo, H, D


def test_fold_attention_kernel_matches_reference():
    from bench_kernels.attn_fold_sublayer_pallas import (
        build_folds,
        fold_attention_reference,
        fused_fold_attention,
    )

    x, ctx, (wq, wk, wv, wo), gamma, beta, bo, H, D = _fold_attn_inputs()
    wt4, vw4 = build_folds(ctx, wq, wk, wv, wo, H, D, jnp.bfloat16)
    ref = fold_attention_reference(x, wt4, vw4, gamma, beta, bo)
    out = fused_fold_attention(x, wt4, vw4, gamma, beta, bo)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_fold_attention_matches_unfused_cross_attention():
    """The folded kernel math vs the production unfused sub-layer
    (LN -> q/k/v proj -> per-head softmax(qk)v -> out proj -> residual):
    same association modulo bf16 rounding of the folds."""
    from bench_kernels.attn_fold_sublayer_pallas import (
        build_folds,
        fused_fold_attention,
    )

    x, ctx, (wq, wk, wv, wo), gamma, beta, bo, H, D = _fold_attn_inputs()
    B, N, C = x.shape
    L = ctx.shape[1]

    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    xn = ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * gamma + beta).astype(
        jnp.bfloat16
    )
    q = (xn.astype(jnp.float32) @ wq).reshape(B, N, H, D)
    kk = (ctx.astype(jnp.float32) @ wk).reshape(B, L, H, D)
    vv = (ctx.astype(jnp.float32) @ wv).reshape(B, L, H, D)
    sim = jnp.einsum("bihd,bjhd->bhij", q, kk) * (D ** -0.5)
    p = jax.nn.softmax(sim, -1)
    o = jnp.einsum("bhij,bjhd->bihd", p, vv).reshape(B, N, C)
    want = (xf + o @ wo + bo).astype(jnp.bfloat16)

    wt4, vw4 = build_folds(ctx, wq, wk, wv, wo, H, D, jnp.bfloat16)
    got = fused_fold_attention(x, wt4, vw4, gamma, beta, bo)
    d = np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32))
    rel = d.max() / np.abs(np.asarray(want, np.float32)).max()
    assert rel < 0.03, rel


def test_fold_attention_differentiable():
    from bench_kernels.attn_fold_sublayer_pallas import (
        build_folds,
        fold_attention_reference,
        fused_fold_attention,
    )

    x, ctx, (wq, wk, wv, wo), gamma, beta, bo, H, D = _fold_attn_inputs()
    wt4, vw4 = build_folds(ctx, wq, wk, wv, wo, H, D, jnp.bfloat16)

    def loss(f):
        return lambda x, wt4: jnp.sum(
            f(x, wt4, vw4, gamma, beta, bo).astype(jnp.float32) ** 2
        )

    gx, gw = jax.grad(loss(fused_fold_attention), argnums=(0, 1))(x, wt4)
    rx, rw = jax.grad(loss(fold_attention_reference), argnums=(0, 1))(x, wt4)
    np.testing.assert_allclose(
        np.asarray(gx, np.float32), np.asarray(rx, np.float32),
        atol=1e-2, rtol=1e-2,
    )
    np.testing.assert_allclose(
        np.asarray(gw, np.float32), np.asarray(rw, np.float32),
        atol=1e-2, rtol=1e-2,
    )
