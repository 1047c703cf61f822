"""Stable-Diffusion AutoencoderKL in Flax (the frozen latent codec).

The reference uses diffusers' pretrained ``AutoencoderKL`` frozen with
scale 0.18215 (``trainModifyCondition.py:703-706,1130-1139``; decode
``train.py:239-247``). This is a from-scratch NHWC Flax implementation
of that architecture (f8, channel mult (1,2,4,4), 2 resnet blocks per
level, mid-block single-head attention, 4 latent channels) plus a
converter from diffusers-format checkpoints
(``convert_diffusers_vae``), so published SD VAE weights load directly.

64x256 px -> 8x32x4 latents at f8.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..configs.config import VAEConfig

Dtype = Any


def _gn(name: str):
    """GroupNorm(32), eps 1e-6 (SD convention). Returns a callable that
    must be invoked inside a @nn.compact context; group count adapts for
    narrow test configs."""

    def apply(x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        groups = 32 if c % 32 == 0 else c
        return nn.GroupNorm(
            num_groups=groups, epsilon=1e-6, dtype=jnp.float32,
            param_dtype=jnp.float32, name=name,
        )(x)

    return apply


class VAEResnetBlock(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        h = _gn("norm1")(x.astype(jnp.float32)).astype(self.dtype)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv1")(h)
        h = _gn("norm2")(h.astype(jnp.float32)).astype(self.dtype)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name="conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    """Single-head self-attention over spatial tokens (mid block)."""

    channels: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        res = x
        x = _gn("group_norm")(x.astype(jnp.float32)).astype(self.dtype)
        x = x.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="to_q")(x)
        k = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="to_k")(x)
        v = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="to_v")(x)
        sim = jnp.einsum("bid,bjd->bij", q, k,
                         preferred_element_type=jnp.float32) * (c ** -0.5)
        attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
        out = jnp.einsum("bij,bjd->bid", attn, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                       name="to_out")(out)
        return res + out.reshape(b, h, w, c)


class Encoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        ch = cfg.base_channels
        h = nn.Conv(ch, (3, 3), padding="SAME", dtype=dtype,
                    param_dtype=jnp.float32, name="conv_in")(x.astype(dtype))
        for i, mult in enumerate(cfg.channel_mult):
            out_ch = cfg.base_channels * mult
            for j in range(cfg.num_res_blocks):
                h = VAEResnetBlock(out_ch, dtype=dtype, name=f"down_{i}_res_{j}")(h)
            if i != len(cfg.channel_mult) - 1:
                # asymmetric pad (0,1) then stride-2 conv, like SD
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(out_ch, (3, 3), strides=(2, 2), padding="VALID",
                            dtype=dtype, param_dtype=jnp.float32,
                            name=f"down_{i}_downsample")(h)
        h = VAEResnetBlock(h.shape[-1], dtype=dtype, name="mid_res_1")(h)
        h = VAEAttention(h.shape[-1], dtype=dtype, name="mid_attn")(h)
        h = VAEResnetBlock(h.shape[-1], dtype=dtype, name="mid_res_2")(h)
        h = _gn("conv_norm_out")(h.astype(jnp.float32)).astype(dtype)
        h = nn.silu(h)
        moments = nn.Conv(2 * cfg.latent_channels, (3, 3), padding="SAME",
                          dtype=dtype, param_dtype=jnp.float32,
                          name="conv_out")(h)
        return moments


class Decoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        ch = cfg.base_channels * cfg.channel_mult[-1]
        h = nn.Conv(ch, (3, 3), padding="SAME", dtype=dtype,
                    param_dtype=jnp.float32, name="conv_in")(z.astype(dtype))
        h = VAEResnetBlock(ch, dtype=dtype, name="mid_res_1")(h)
        h = VAEAttention(ch, dtype=dtype, name="mid_attn")(h)
        h = VAEResnetBlock(ch, dtype=dtype, name="mid_res_2")(h)
        for i, mult in reversed(list(enumerate(cfg.channel_mult))):
            out_ch = cfg.base_channels * mult
            for j in range(cfg.num_res_blocks + 1):
                h = VAEResnetBlock(out_ch, dtype=dtype, name=f"up_{i}_res_{j}")(h)
            if i != 0:
                # 2x nearest upsample as broadcast+reshape — identical
                # values to jax.image.resize(..., "nearest") without its
                # gather lowering (the same adopted optimisation as the
                # UNet's Upsample; BENCHMARKS.md round 1)
                b, hh, ww, cc = h.shape
                h = jnp.broadcast_to(
                    h[:, :, None, :, None, :], (b, hh, 2, ww, 2, cc)
                ).reshape(b, hh * 2, ww * 2, cc)
                h = nn.Conv(out_ch, (3, 3), padding="SAME", dtype=dtype,
                            param_dtype=jnp.float32,
                            name=f"up_{i}_upsample")(h)
        h = _gn("conv_norm_out")(h.astype(jnp.float32)).astype(dtype)
        h = nn.silu(h)
        img = nn.Conv(cfg.in_channels, (3, 3), padding="SAME", dtype=dtype,
                      param_dtype=jnp.float32, name="conv_out")(h)
        return img.astype(jnp.float32)


class AutoencoderKL(nn.Module):
    """encode -> (mean, logvar); decode(z) -> image. All NHWC."""

    cfg: VAEConfig = VAEConfig()

    def setup(self):
        self.encoder = Encoder(self.cfg, name="encoder")
        self.decoder = Decoder(self.cfg, name="decoder")
        dtype = jnp.dtype(self.cfg.dtype)
        self.quant_conv = nn.Conv(
            2 * self.cfg.latent_channels, (1, 1), dtype=dtype,
            param_dtype=jnp.float32, name="quant_conv",
        )
        self.post_quant_conv = nn.Conv(
            self.cfg.latent_channels, (1, 1), dtype=dtype,
            param_dtype=jnp.float32, name="post_quant_conv",
        )

    def encode(self, x: jax.Array):
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments.astype(jnp.float32), 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        return mean, logvar

    def decode(self, z: jax.Array) -> jax.Array:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jax.Array, rng: jax.Array):
        mean, logvar = self.encode(x)
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
            rng, mean.shape, jnp.float32
        )
        return self.decode(z), mean, logvar


def encode_to_latent(
    vae: AutoencoderKL, params, x: jax.Array, rng: jax.Array,
    scaling: float = 0.18215, sample: bool = True,
) -> jax.Array:
    """latent = sample(posterior) * 0.18215 (``trainModifyCondition.py:
    703-706``)."""
    mean, logvar = vae.apply(params, x, method=AutoencoderKL.encode)
    if sample:
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
            rng, mean.shape, jnp.float32
        )
    else:
        z = mean
    return z * scaling


def decode_from_latent(
    vae: AutoencoderKL, params, z: jax.Array, scaling: float = 0.18215
) -> jax.Array:
    return vae.apply(params, z / scaling, method=AutoencoderKL.decode)


# ---------------------------------------------------------------------------
# diffusers checkpoint conversion
# ---------------------------------------------------------------------------

def _conv_w(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _attn_w(w: np.ndarray) -> np.ndarray:
    """attention projection: torch Linear [out,in] (or 1x1 conv
    [out,in,1,1]) -> flax Dense [in,out]."""
    if w.ndim == 4:
        w = w[:, :, 0, 0]
    return np.transpose(w, (1, 0))


def convert_diffusers_vae(sd: dict, cfg: VAEConfig = VAEConfig()) -> dict:
    """Map a diffusers AutoencoderKL state dict (numpy arrays, e.g. from
    ``safetensors.numpy.load_file``) onto this module's param tree.

    Supports both naming eras: ``to_q/to_k/to_v/to_out.0`` and the older
    ``query/key/value/proj_attn``.
    """

    def get(*names):
        for n in names:
            if n in sd:
                return np.asarray(sd[n])
        raise KeyError(names[0])

    def conv(prefix):
        return {
            "kernel": _conv_w(get(prefix + ".weight")),
            "bias": get(prefix + ".bias"),
        }

    def norm(prefix):
        return {"scale": get(prefix + ".weight"), "bias": get(prefix + ".bias")}

    def resnet(prefix, has_shortcut):
        out = {
            "norm1": norm(prefix + ".norm1"),
            "conv1": conv(prefix + ".conv1"),
            "norm2": norm(prefix + ".norm2"),
            "conv2": conv(prefix + ".conv2"),
        }
        if has_shortcut:
            out["conv_shortcut"] = conv(prefix + ".conv_shortcut")
        return out

    def attn(prefix):
        def lin(new, *olds):
            w = get(*[f"{prefix}.{o}.weight" for o in olds])
            b = get(*[f"{prefix}.{o}.bias" for o in olds])
            return {"kernel": _attn_w(w), "bias": b}

        return {
            "group_norm": norm(prefix + ".group_norm"),
            "to_q": lin("to_q", "to_q", "query"),
            "to_k": lin("to_k", "to_k", "key"),
            "to_v": lin("to_v", "to_v", "value"),
            "to_out": lin("to_out", "to_out.0", "proj_attn"),
        }

    mult = cfg.channel_mult
    enc: dict = {"conv_in": conv("encoder.conv_in")}
    ch = cfg.base_channels
    for i, m in enumerate(mult):
        out_ch = cfg.base_channels * m
        for j in range(cfg.num_res_blocks):
            enc[f"down_{i}_res_{j}"] = resnet(
                f"encoder.down_blocks.{i}.resnets.{j}", ch != out_ch
            )
            ch = out_ch
        if i != len(mult) - 1:
            enc[f"down_{i}_downsample"] = conv(
                f"encoder.down_blocks.{i}.downsamplers.0.conv"
            )
    enc["mid_res_1"] = resnet("encoder.mid_block.resnets.0", False)
    enc["mid_attn"] = attn("encoder.mid_block.attentions.0")
    enc["mid_res_2"] = resnet("encoder.mid_block.resnets.1", False)
    enc["conv_norm_out"] = norm("encoder.conv_norm_out")
    enc["conv_out"] = conv("encoder.conv_out")

    dec: dict = {"conv_in": conv("decoder.conv_in")}
    dec["mid_res_1"] = resnet("decoder.mid_block.resnets.0", False)
    dec["mid_attn"] = attn("decoder.mid_block.attentions.0")
    dec["mid_res_2"] = resnet("decoder.mid_block.resnets.1", False)
    ch = cfg.base_channels * mult[-1]
    for rev, (i, m) in enumerate(reversed(list(enumerate(mult)))):
        out_ch = cfg.base_channels * m
        for j in range(cfg.num_res_blocks + 1):
            dec[f"up_{i}_res_{j}"] = resnet(
                f"decoder.up_blocks.{rev}.resnets.{j}", ch != out_ch
            )
            ch = out_ch
        if i != 0:
            dec[f"up_{i}_upsample"] = conv(
                f"decoder.up_blocks.{rev}.upsamplers.0.conv"
            )
    dec["conv_norm_out"] = norm("decoder.conv_norm_out")
    dec["conv_out"] = conv("decoder.conv_out")

    return {
        "params": {
            "encoder": enc,
            "decoder": dec,
            "quant_conv": conv("quant_conv"),
            "post_quant_conv": conv("post_quant_conv"),
        }
    }
