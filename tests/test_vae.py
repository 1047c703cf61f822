import jax
import jax.numpy as jnp
import numpy as np
import pytest

from worddiffusion_tpu.configs.config import VAEConfig
from worddiffusion_tpu.models.vae import (
    AutoencoderKL,
    convert_diffusers_vae,
    decode_from_latent,
    encode_to_latent,
)


def small_cfg():
    # tiny VAE, same topology (f8, 3 downsamples), fast on CPU
    return VAEConfig(base_channels=16, channel_mult=(1, 1, 2, 2),
                     num_res_blocks=1, dtype="float32")


def test_encode_decode_shapes():
    cfg = small_cfg()
    vae = AutoencoderKL(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 64, 256, 3))
    params = vae.init(rng, x, rng)
    mean, logvar = vae.apply(params, x, method=AutoencoderKL.encode)
    assert mean.shape == (1, 8, 32, 4)
    assert logvar.shape == (1, 8, 32, 4)
    img = vae.apply(params, mean, method=AutoencoderKL.decode)
    assert img.shape == x.shape
    assert img.dtype == jnp.float32


def test_latent_scaling_roundtrip():
    cfg = small_cfg()
    vae = AutoencoderKL(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 64, 256, 3))
    params = vae.init(rng, x, rng)
    z = encode_to_latent(vae, params, x, rng, sample=False)
    assert z.shape == (1, 8, 32, 4)
    img = decode_from_latent(vae, params, z)
    assert img.shape == x.shape
    # scaling is really applied: z == mean * 0.18215
    mean, _ = vae.apply(params, x, method=AutoencoderKL.encode)
    assert np.allclose(np.asarray(z), np.asarray(mean) * 0.18215, atol=1e-6)


def _fake_diffusers_sd(cfg: VAEConfig):
    """Synthetic diffusers-format state dict with correct shapes."""
    sd = {}
    rng = np.random.default_rng(0)

    def conv(name, cin, cout, k=3):
        sd[name + ".weight"] = rng.normal(size=(cout, cin, k, k)).astype(np.float32)
        sd[name + ".bias"] = rng.normal(size=(cout,)).astype(np.float32)

    def norm(name, c):
        sd[name + ".weight"] = np.ones((c,), np.float32)
        sd[name + ".bias"] = np.zeros((c,), np.float32)

    def resnet(name, cin, cout):
        norm(name + ".norm1", cin)
        conv(name + ".conv1", cin, cout)
        norm(name + ".norm2", cout)
        conv(name + ".conv2", cout, cout)
        if cin != cout:
            conv(name + ".conv_shortcut", cin, cout, k=1)

    def attn(name, c):
        norm(name + ".group_norm", c)
        for p in ["to_q", "to_k", "to_v", "to_out.0"]:
            sd[f"{name}.{p}.weight"] = rng.normal(size=(c, c)).astype(np.float32)
            sd[f"{name}.{p}.bias"] = np.zeros((c,), np.float32)

    bc, mult, nrb = cfg.base_channels, cfg.channel_mult, cfg.num_res_blocks
    conv("encoder.conv_in", cfg.in_channels, bc)
    ch = bc
    for i, m in enumerate(mult):
        out = bc * m
        for j in range(nrb):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}", ch, out)
            ch = out
        if i != len(mult) - 1:
            conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", ch, ch)
    resnet("encoder.mid_block.resnets.0", ch, ch)
    attn("encoder.mid_block.attentions.0", ch)
    resnet("encoder.mid_block.resnets.1", ch, ch)
    norm("encoder.conv_norm_out", ch)
    conv("encoder.conv_out", ch, 2 * cfg.latent_channels)
    conv("quant_conv", 2 * cfg.latent_channels, 2 * cfg.latent_channels, k=1)
    conv("post_quant_conv", cfg.latent_channels, cfg.latent_channels, k=1)
    ch = bc * mult[-1]
    conv("decoder.conv_in", cfg.latent_channels, ch)
    resnet("decoder.mid_block.resnets.0", ch, ch)
    attn("decoder.mid_block.attentions.0", ch)
    resnet("decoder.mid_block.resnets.1", ch, ch)
    for rev, (i, m) in enumerate(reversed(list(enumerate(mult)))):
        out = bc * m
        for j in range(nrb + 1):
            resnet(f"decoder.up_blocks.{rev}.resnets.{j}", ch, out)
            ch = out
        if i != 0:
            conv(f"decoder.up_blocks.{rev}.upsamplers.0.conv", ch, ch)
    norm("decoder.conv_norm_out", ch)
    conv("decoder.conv_out", ch, cfg.in_channels)
    return sd


def test_diffusers_conversion_loads_and_runs():
    cfg = small_cfg()
    sd = _fake_diffusers_sd(cfg)
    params = convert_diffusers_vae(sd, cfg)

    vae = AutoencoderKL(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 64, 256, 3)) * 0.1
    # init to get the expected tree structure, then compare
    ref = vae.init(rng, x, rng)
    ref_flat = jax.tree_util.tree_flatten_with_path(ref)[0]
    got_flat = jax.tree_util.tree_flatten_with_path(params)[0]
    ref_keys = {tuple(str(k) for k in p): v.shape for p, v in ref_flat}
    got_keys = {tuple(str(k) for k in p): np.asarray(v).shape for p, v in got_flat}
    assert ref_keys == got_keys, (
        set(ref_keys) ^ set(got_keys) or "shape mismatch"
    )
    # converted params actually run
    mean, logvar = vae.apply(params, x, method=AutoencoderKL.encode)
    img = vae.apply(params, mean, method=AutoencoderKL.decode)
    assert np.all(np.isfinite(np.asarray(img)))


def test_old_attention_naming_supported():
    cfg = small_cfg()
    sd = _fake_diffusers_sd(cfg)
    # rename to the pre-0.15 diffusers convention, with 1x1-conv weights
    renames = {"to_q": "query", "to_k": "key", "to_v": "value",
               "to_out.0": "proj_attn"}
    old = {}
    for k, v in sd.items():
        nk = k
        for new, oldname in renames.items():
            for blk in ["encoder.mid_block.attentions.0",
                        "decoder.mid_block.attentions.0"]:
                nk = nk.replace(f"{blk}.{new}.", f"{blk}.{oldname}.")
        if "proj_attn.weight" in nk or any(
            f".{n}.weight" in nk for n in ["query", "key", "value"]
        ):
            v = v[:, :, None, None]  # 1x1 conv form
        old[nk] = v
    params = convert_diffusers_vae(old, cfg)
    vae = AutoencoderKL(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 64, 256, 3)) * 0.1
    mean, _ = vae.apply(params, x, method=AutoencoderKL.encode)
    assert mean.shape == (1, 8, 32, 4)
