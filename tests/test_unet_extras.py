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
