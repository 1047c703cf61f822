import jax
import jax.numpy as jnp
import numpy as np
import pytest

from worddiffusion_tpu.configs.config import UNetConfig
from worddiffusion_tpu.models.unet import UNet


def tiny_cfg(**kw):
    base = dict(
        in_channels=4,
        model_channels=32,
        out_channels=4,
        num_res_blocks=1,
        channel_mult=(1, 1),
        attention_resolutions=(1,),
        num_heads=4,
        context_dim=32,
        vocab_size=54,
        num_writers=16,
        max_seq_len=10,
        dtype="float32",
    )
    base.update(kw)
    return UNetConfig(**base)


def make_inputs(rng, b=2, L=10):
    x = jax.random.normal(rng, (b, 8, 32, 4))
    t = jnp.array([5, 100])
    ctx = jax.random.randint(jax.random.fold_in(rng, 1), (b, L), 0, 53)
    wid = jnp.array([0, 3])
    return x, t, ctx, wid


def test_forward_shape_research_variant():
    cfg = tiny_cfg(attn1_cross=True)
    model = UNet(cfg)
    rng = jax.random.PRNGKey(0)
    x, t, ctx, wid = make_inputs(rng)
    params = model.init(rng, x, t, ctx, wid)
    out = model.apply(params, x, t, ctx, wid)
    assert out.shape == x.shape
    assert out.dtype == jnp.float32


def test_forward_shape_wordstylist_variant():
    cfg = tiny_cfg(attn1_cross=False)
    model = UNet(cfg)
    rng = jax.random.PRNGKey(0)
    x, t, ctx, wid = make_inputs(rng)
    params = model.init(rng, x, t, ctx, wid)
    out = model.apply(params, x, t, ctx, wid)
    assert out.shape == x.shape


def test_zero_init_output_at_init():
    # out conv is zero-init, so eps-hat == 0 at init (residual identity).
    cfg = tiny_cfg()
    model = UNet(cfg)
    rng = jax.random.PRNGKey(0)
    x, t, ctx, wid = make_inputs(rng)
    params = model.init(rng, x, t, ctx, wid)
    out = model.apply(params, x, t, ctx, wid)
    assert np.allclose(np.asarray(out), 0.0)


def test_phosc_conditioning_changes_output():
    cfg = tiny_cfg(use_phosc=True, phosc_dim=20, attn1_cross=False)
    model = UNet(cfg)
    rng = jax.random.PRNGKey(0)
    x, t, ctx, wid = make_inputs(rng)
    phosc = jax.random.randint(rng, (2, 20), 0, 5)
    params = model.init(rng, x, t, ctx, wid, phosc_ids=phosc)
    o1 = model.apply(params, x, t, ctx, wid, phosc_ids=phosc)
    o2 = model.apply(params, x, t, ctx, wid, phosc_ids=phosc + 1)
    assert o1.shape == x.shape
    # zero-init out conv -> both zero at init; perturb the out conv to
    # make sensitivity observable.
    params = jax.tree_util.tree_map(
        lambda p: p + 0.01 if p.ndim == 4 else p, params
    )
    o1 = model.apply(params, x, t, ctx, wid, phosc_ids=phosc)
    o2 = model.apply(params, x, t, ctx, wid, phosc_ids=phosc + 1)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_writer_conditioning_changes_output():
    cfg = tiny_cfg()
    model = UNet(cfg)
    rng = jax.random.PRNGKey(0)
    x, t, ctx, wid = make_inputs(rng)
    params = model.init(rng, x, t, ctx, wid)
    params = jax.tree_util.tree_map(lambda p: p + 0.01 if p.ndim == 4 else p, params)
    o1 = model.apply(params, x, t, ctx, wid)
    o2 = model.apply(params, x, t, ctx, jnp.array([1, 4]))
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_ocr_head_output():
    cfg = tiny_cfg(ocr_head=True, ocr_classes=52, ocr_hidden=32, ocr_layers=1)
    model = UNet(cfg)
    rng = jax.random.PRNGKey(0)
    x, t, ctx, wid = make_inputs(rng)
    variables = model.init(rng, x, t, ctx, wid)
    eps, logits = model.apply(variables, x, t, ctx, wid)
    assert eps.shape == x.shape
    assert logits.shape == (256, 2, 52)  # [T, B, K]


def test_default_config_param_count():
    # Published config: ~constant-width 320ch UNet. Check params build
    # and total count is in the expected tens-of-millions range.
    cfg = UNetConfig(dtype="float32")
    model = UNet(cfg)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 8, 32, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 42), jnp.int32)
    wid = jnp.zeros((1,), jnp.int32)
    params = jax.eval_shape(lambda: model.init(rng, x, t, ctx, wid))
    n = sum(int(np.prod(v.shape)) for v in jax.tree_util.tree_leaves(params))
    # hand count of the published architecture: ~8 ResBlocks (2.3M each)
    # + 5 SpatialTransformers (2.5M each) + time/label/word embeddings
    # ~= 36M params.
    assert 30_000_000 < n < 45_000_000, n


def test_jit_and_grad():
    cfg = tiny_cfg()
    model = UNet(cfg)
    rng = jax.random.PRNGKey(0)
    x, t, ctx, wid = make_inputs(rng)
    params = model.init(rng, x, t, ctx, wid)

    @jax.jit
    def loss_fn(p):
        out = model.apply(p, x, t, ctx, wid)
        return jnp.mean((out - 1.0) ** 2)

    g = jax.jit(jax.grad(loss_fn))(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in flat)
    # gradient reaches the embedding tables
    total = sum(float(jnp.abs(l).sum()) for l in flat)
    assert total > 0


def test_pallas_ffn_param_tree_and_output_parity():
    """use_pallas_ffn must not change the param tree (checkpoint
    interop) and must match the unfused path numerically."""
    cfg_off = tiny_cfg(use_pallas_ffn=False)
    cfg_on = tiny_cfg(use_pallas_ffn=True)
    rng = jax.random.PRNGKey(0)
    x, t, ctx, wid = make_inputs(rng)
    params = UNet(cfg_off).init(rng, x, t, ctx, wid)
    params_on = UNet(cfg_on).init(rng, x, t, ctx, wid)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        params_on
    )
    out_off = UNet(cfg_off).apply(params, x, t, ctx, wid)
    out_on = UNet(cfg_on).apply(params, x, t, ctx, wid)
    assert np.allclose(np.asarray(out_on), np.asarray(out_off), atol=5e-4)


def test_pallas_ffn_grad_matches_unfused():
    """The TPU-default fused FF sub-layer must be trainable: grads via
    the custom_vjp recompute backward match the unfused path."""
    rng = jax.random.PRNGKey(1)
    x, t, ctx, wid = make_inputs(rng)
    cfg_off = tiny_cfg(use_pallas_ffn=False)
    cfg_on = tiny_cfg(use_pallas_ffn=True)
    params = UNet(cfg_off).init(rng, x, t, ctx, wid)
    tgt = jax.random.normal(jax.random.fold_in(rng, 9), x.shape)

    def loss(model):
        return lambda p: jnp.mean(
            (model.apply(p, x, t, ctx, wid) - tgt) ** 2
        )

    g_off = jax.grad(loss(UNet(cfg_off)))(params)
    g_on = jax.grad(loss(UNet(cfg_on)))(params)
    flat_off = jax.tree_util.tree_leaves(g_off)
    flat_on = jax.tree_util.tree_leaves(g_on)
    for a, b in zip(flat_off, flat_on):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=5e-4)
