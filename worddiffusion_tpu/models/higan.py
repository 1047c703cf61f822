"""BigGAN-style conditional generator as an alternative denoiser.

The reference's ``trainModifyConditionHiGan.py`` (``--hiGanArch=1``)
swaps the UNet for the HiGAN+ BigGAN ``Generator`` called as
``model(x_t, text, text_len, t, s_id)`` (``:383-389``) and trains it
with the same MSE-on-noise objective. The ``hiGan`` package is absent
from the reference repo (SURVEY.md §0), so this is a from-scratch
equivalent with the BigGAN ingredients that matter: class/condition-
modulated normalisation (scale-shift from a shared conditioning vector
of t-emb ++ writer-emb ++ pooled text emb) around 3x3 conv residual
blocks at constant latent resolution.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..configs.config import UNetConfig
from .encoders import CharacterEncoder
from .layers import Conv2D, Dense, GroupNorm32, timestep_embedding

Dtype = Any


class CondResBlock(nn.Module):
    """Residual block with condition-modulated GroupNorm (the
    BigGAN-style shared-embedding conditional BN, TPU-friendly GN)."""

    channels: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, cond: jax.Array) -> jax.Array:
        def cgn(h, name):
            h = GroupNorm32(name=name)(h)
            ss = Dense(2 * self.channels, dtype=self.dtype, name=name + "_proj")(cond)
            scale, shift = jnp.split(ss[:, None, None, :], 2, axis=-1)
            return h * (1 + scale) + shift

        h = cgn(x, "cgn1")
        h = nn.silu(h)
        h = Conv2D(self.channels, dtype=self.dtype, name="conv1")(h)
        h = cgn(h, "cgn2")
        h = nn.silu(h)
        h = Conv2D(self.channels, zero_init=True, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.channels:
            x = Conv2D(self.channels, kernel=(1, 1), dtype=self.dtype, name="skip")(x)
        return x + h


class HiGanDenoiserAdapter(nn.Module):
    """Exposes the UNet call signature so the generator drops into the
    standard train step / sampler (``--hiGanArch 1``). ``text_len`` is
    derived from the PAD tail of the context ids."""

    cfg: UNetConfig
    num_blocks: int = 6

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        t: jax.Array,
        context_ids: jax.Array = None,
        writer_id: jax.Array = None,
        phosc_ids=None,
        style_vec=None,
        writer_mask=None,
        writer_id2=None,
        mix_rate=None,
        cond_latents=None,
        char_images=None,
        deterministic: bool = True,
    ) -> jax.Array:
        from ..data.tokenizer import PAD_TOKEN

        text_len = jnp.sum((context_ids != PAD_TOKEN).astype(jnp.int32), axis=1)
        return HiGanGenerator(self.cfg, self.num_blocks, name="generator")(
            x, context_ids, text_len, t, writer_id
        )


class HiGanGenerator(nn.Module):
    """x_t + (text, text_len, t, writer) -> predicted noise."""

    cfg: UNetConfig
    num_blocks: int = 6

    @nn.compact
    def __call__(
        self,
        x: jax.Array,           # [B, H, W, C]
        text_ids: jax.Array,    # [B, L]
        text_len: jax.Array,    # [B] (unused beyond masking parity)
        t: jax.Array,           # [B]
        writer_id: jax.Array,   # [B]
    ) -> jax.Array:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        emb_dim = cfg.model_channels

        t_emb = Dense(emb_dim, dtype=dtype, name="t_proj")(
            timestep_embedding(t, cfg.model_channels).astype(dtype)
        )
        w_emb = nn.Embed(
            cfg.num_writers, emb_dim, dtype=dtype, param_dtype=jnp.float32,
            name="writer_emb",
        )(jnp.clip(writer_id, 0, cfg.num_writers - 1))
        txt = CharacterEncoder(
            vocab_size=cfg.vocab_size,
            hidden_size=cfg.context_dim,
            max_seq_len=cfg.max_seq_len,
            dtype=dtype,
            name="text_enc",
        )(text_ids)
        # length-masked mean pool of the text tokens
        mask = (
            jnp.arange(text_ids.shape[1])[None, :] < text_len[:, None]
        ).astype(txt.dtype)
        txt_pooled = (txt * mask[..., None]).sum(1) / jnp.maximum(
            mask.sum(1, keepdims=True), 1.0
        )
        cond = jnp.concatenate([t_emb, w_emb, txt_pooled.astype(dtype)], axis=-1)

        h = Conv2D(cfg.model_channels, dtype=dtype, name="conv_in")(x.astype(dtype))
        for i in range(self.num_blocks):
            h = CondResBlock(cfg.model_channels, dtype=dtype, name=f"block_{i}")(h, cond)
        h = GroupNorm32(name="out_norm")(h)
        h = nn.silu(h)
        out = Conv2D(cfg.out_channels, zero_init=True, dtype=dtype, name="conv_out")(h)
        return out.astype(jnp.float32)
