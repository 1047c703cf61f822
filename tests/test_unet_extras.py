import jax
import jax.numpy as jnp
import numpy as np

from worddiffusion_tpu.configs.config import UNetConfig
from worddiffusion_tpu.models.unet import UNet


def tiny(**kw):
    base = dict(
        model_channels=32, context_dim=32, num_heads=4, vocab_size=54,
        num_writers=8, max_seq_len=10, dtype="float32",
    )
    base.update(kw)
    return UNetConfig(**base)


def inputs(rng, b=2):
    return (
        jax.random.normal(rng, (b, 8, 32, 4)),
        jnp.array([5, 50]),
        jax.random.randint(rng, (b, 10), 0, 53),
        jnp.array([0, 3]),
    )


def test_attention_maps_via_intermediates():
    cfg = tiny(return_attn=True)
    model = UNet(cfg)
    rng = jax.random.PRNGKey(0)
    x, t, ctx, wid = inputs(rng)
    params = model.init(rng, x, t, ctx, wid)
    out, mods = model.apply(params, x, t, ctx, wid, mutable=["intermediates"])
    inter = mods["intermediates"]
    # attention maps from every spatial transformer (attn1+attn2 each)
    flat = jax.tree_util.tree_leaves(inter)
    assert len(flat) >= 8
    # full-res maps: [B, heads, 256 tokens, ctx len]
    shapes = {l.shape for l in flat}
    assert any(s[2] == 256 and s[3] == 10 for s in shapes)


def test_writer_interpolation():
    cfg = tiny()
    model = UNet(cfg)
    rng = jax.random.PRNGKey(0)
    x, t, ctx, wid = inputs(rng)
    params = model.init(rng, x, t, ctx, wid)
    params = jax.tree_util.tree_map(lambda p: p + 0.01 if p.ndim == 4 else p, params)
    wid2 = jnp.array([5, 6])
    o_a = model.apply(params, x, t, ctx, wid, writer_id2=wid2,
                      mix_rate=jnp.zeros((2,)))
    o_plain = model.apply(params, x, t, ctx, wid)
    assert np.allclose(np.asarray(o_a), np.asarray(o_plain), atol=1e-5)
    o_b = model.apply(params, x, t, ctx, wid, writer_id2=wid2,
                      mix_rate=jnp.ones((2,)))
    o_w2 = model.apply(params, x, t, ctx, wid2)
    assert np.allclose(np.asarray(o_b), np.asarray(o_w2), atol=1e-5)
    o_mix = model.apply(params, x, t, ctx, wid, writer_id2=wid2,
                        mix_rate=jnp.full((2,), 0.5))
    assert not np.allclose(np.asarray(o_mix), np.asarray(o_plain))


def test_img_conditioned_channel_concat():
    cfg = tiny(img_conditioned=True)
    model = UNet(cfg)
    rng = jax.random.PRNGKey(0)
    x, t, ctx, wid = inputs(rng)
    cond = jax.random.normal(jax.random.fold_in(rng, 9), x.shape)
    params = model.init(rng, x, t, ctx, wid, cond_latents=cond)
    out = model.apply(params, x, t, ctx, wid, cond_latents=cond)
    assert out.shape == x.shape
    params = jax.tree_util.tree_map(lambda p: p + 0.01 if p.ndim == 4 else p, params)
    o1 = model.apply(params, x, t, ctx, wid, cond_latents=cond)
    o2 = model.apply(params, x, t, ctx, wid, cond_latents=cond * 2)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_char_image_conditioning():
    cfg = tiny(use_char_images=True)
    model = UNet(cfg)
    rng = jax.random.PRNGKey(0)
    x, t, ctx, wid = inputs(rng)
    glyphs = jax.random.normal(jax.random.fold_in(rng, 3), (2, 10, 16, 16, 1))
    params = model.init(rng, x, t, ctx, wid, char_images=glyphs)
    out = model.apply(params, x, t, ctx, wid, char_images=glyphs)
    assert out.shape == x.shape
    params = jax.tree_util.tree_map(lambda p: p + 0.01 if p.ndim == 4 else p, params)
    o1 = model.apply(params, x, t, ctx, wid, char_images=glyphs)
    o2 = model.apply(params, x, t, ctx, wid, char_images=glyphs * 3)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def _randomize(params, seed=3):
    """Replace every param with small random values: the zero-init
    output convs otherwise make whole sub-paths contribute exactly 0,
    silently weakening equivalence tests."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef,
        [
            0.05 * jax.random.normal(k, l.shape, l.dtype)
            for k, l in zip(keys, leaves)
        ],
    )


def test_split_skip_conv_matches_concat():
    """Decoder skip-concat split (UNetConfig.split_skip_conv): the
    per-half GroupNorm + two half-K convs must reproduce the concat
    form exactly modulo fp accumulation order."""
    cfg_cat = tiny(split_skip_conv=False)
    cfg_split = tiny(split_skip_conv=True)
    rng = jax.random.PRNGKey(0)
    x, t, ctx, wid = inputs(rng)
    params = UNet(cfg_cat).init(rng, x, t, ctx, wid)
    # identical param trees: the split path declares the concat-shaped
    # modules (checkpoint interop)
    p2 = UNet(cfg_split).init(rng, x, t, ctx, wid)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p2)
    params = _randomize(params)
    a = UNet(cfg_cat).apply(params, x, t, ctx, wid)
    b = UNet(cfg_split).apply(params, x, t, ctx, wid)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)


def test_split_skip_conv_falls_back_when_groups_straddle():
    """Halves whose width does not divide the group width must fall
    back to the concat form (still correct, just unsplit)."""
    # channel_mult (1, 2) at c=32 makes the widest decoder concat
    # 64+32=96 channels: group width 3, first half 64 % 3 != 0 — the
    # groups straddle the halves, so the block must take the concat path
    cfg = tiny(split_skip_conv=True, channel_mult=(1, 2))
    rng = jax.random.PRNGKey(1)
    x, t, ctx, wid = inputs(rng)
    params = _randomize(UNet(cfg).init(rng, x, t, ctx, wid))
    out = UNet(cfg).apply(params, x, t, ctx, wid)
    ref = UNet(tiny(split_skip_conv=False, channel_mult=(1, 2))).apply(
        params, x, t, ctx, wid
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_fast_softmax_small_drift():
    """bf16 softmax intermediates (UNetConfig.fast_softmax) stay within
    bf16 rounding of the fp32-softmax output."""
    cfg32 = tiny(fast_softmax=False, dtype="bfloat16")
    cfg16 = tiny(fast_softmax=True, dtype="bfloat16")
    rng = jax.random.PRNGKey(2)
    x, t, ctx, wid = inputs(rng)
    params = _randomize(UNet(cfg32).init(rng, x, t, ctx, wid))
    a = np.asarray(UNet(cfg32).apply(params, x, t, ctx, wid), np.float32)
    b = np.asarray(UNet(cfg16).apply(params, x, t, ctx, wid), np.float32)
    denom = np.abs(a).max()
    assert np.abs(a - b).max() / denom < 0.02, np.abs(a - b).max() / denom
