"""Conditional UNet denoiser — the flagship model.

TPU-native rebuild of the reference ``UNetModel`` (``unet.py:1096-1836``)
and ``UNetModelPhosc`` (``unetPhosc.py:751-1159``), unified behind one
static config:

- NHWC layout, bf16 activations, fp32 params / GroupNorm / softmax;
- all conditioning (char ids -> CharacterEncoder, writer id -> embedding
  added to the t-embedding, PHOSC ids -> same encoder concatenated on
  the sequence axis, style vectors -> extra context token) resolved
  before the conv trunk so the hot loop is pure matmul/conv;
- architecture variants are construction-time config (no args-in-forward
  branching like ``unet.py:1645-1836``).

Published default (``trainModifyCondition.py:1087-1092``): 320 channels,
channel_mult (1,1), 1 res-block, attention at full resolution + middle,
4 heads, context 320 — a constant-width UNet over the 8x32 latent with a
single Downsample to 4x16.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..configs.config import UNetConfig
from .attention import SpatialTransformer
from .ctc_head import CTCHead
from .encoders import CharacterEncoder, StyleProjection
from .layers import Conv2D, Dense, Downsample, GroupNorm32, Upsample, timestep_embedding

Dtype = Any


def _half_conv3x3(h: jax.Array, kernel: jax.Array, dtype) -> jax.Array:
    """3x3 SAME conv with an explicit kernel slice (no bias)."""
    return jax.lax.conv_general_dilated(
        h.astype(dtype), kernel.astype(dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _group_norm_slice(
    x: jax.Array, gn_params, lo: int, hi: int, groups: int, eps: float
) -> jax.Array:
    """GroupNorm over one half of a virtual channel concat: the
    ``GroupNorm32`` formula with the concat-shaped scale/bias sliced to
    ``[lo:hi]`` and the group count this half owns. Valid only when
    groups never straddle the split (callers check divisibility)."""
    scale = gn_params["scale"][lo:hi]
    bias = gn_params["bias"][lo:hi]
    c = hi - lo
    xg = x.reshape(x.shape[:-1] + (groups, c // groups))
    red = tuple(range(1, x.ndim - 1)) + (x.ndim,)
    mu = jnp.mean(xg, axis=red, keepdims=True, dtype=jnp.float32)
    var = (
        jnp.mean(jnp.square(xg.astype(jnp.float32)), axis=red, keepdims=True)
        - jnp.square(mu)
    )
    inv = jax.lax.rsqrt(var + eps)
    out = (xg.astype(jnp.float32) - mu) * inv
    return (out.reshape(x.shape) * scale + bias).astype(x.dtype)


class ResBlock(nn.Module):
    """GroupNorm-SiLU-conv residual block with timestep injection
    (``unetPhosc.py:427-544``). ``scale_shift`` selects FiLM-style
    conditioning (``use_scale_shift_norm``).

    ``skip_in``: decoder-side skip tensor. When given, the block
    behaves exactly as if called on ``concat([x, skip_in], -1)`` but
    computes the GroupNorm and both input convolutions split per half:
    GroupNorm groups never straddle the halves when each half's width
    divides the group width, so ``GN(concat(a,b)) ==
    concat(GN_ga(a), GN_gb(b))`` with sliced scale/bias, and
    ``conv(concat(a,b)) == conv_a(a) + conv_b(b)`` with the kernel
    sliced on the input-channel axis. Same math modulo fp32
    accumulation order; skips the 2x-width concat materialisation and
    the ~75%-MXU 640-deep conv emission (standalone: ~7% faster;
    in-program: neutral — see ``UNetConfig.split_skip_conv``). The
    param tree is identical to the concat form (checkpoint interop
    unaffected)."""

    out_channels: int
    dropout: float = 0.0
    scale_shift: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        emb: jax.Array,
        deterministic: bool = True,
        skip_in: Optional[jax.Array] = None,
    ) -> jax.Array:
        in_norm = GroupNorm32(name="in_norm")
        in_conv = Conv2D(self.out_channels, dtype=self.dtype, name="in_conv")
        if skip_in is not None:
            cx, cs = x.shape[-1], skip_in.shape[-1]
            in_ch = cx + cs
            # declare the concat-shaped params (dead code under jit)
            dummy = jnp.zeros((1, 1, 1, in_ch), x.dtype)
            in_norm(dummy)
            in_conv(dummy)
            gn_p = in_norm.variables["params"]
            gw = in_ch // in_norm.num_groups        # channels per group
            h1 = _group_norm_slice(x, gn_p, 0, cx, cx // gw, in_norm.epsilon)
            h2 = _group_norm_slice(
                skip_in, gn_p, cx, in_ch, cs // gw, in_norm.epsilon
            )
            conv_p = in_conv.variables["params"]["Conv_0"]
            kernel, cbias = conv_p["kernel"], conv_p["bias"]
            h = (
                _half_conv3x3(nn.silu(h1), kernel[:, :, :cx], self.dtype)
                + _half_conv3x3(nn.silu(h2), kernel[:, :, cx:], self.dtype)
                + cbias.astype(self.dtype)
            )
        else:
            in_ch = x.shape[-1]
            h = in_norm(x)
            h = nn.silu(h)
            h = in_conv(h)

        emb_out = Dense(
            2 * self.out_channels if self.scale_shift else self.out_channels,
            dtype=self.dtype,
            name="emb_proj",
        )(nn.silu(emb))

        if self.scale_shift:
            scale, shift = jnp.split(emb_out[:, None, None, :], 2, axis=-1)
            h = GroupNorm32(name="out_norm")(h) * (1 + scale) + shift
        else:
            h = h + emb_out[:, None, None, :]
            h = GroupNorm32(name="out_norm")(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = Conv2D(self.out_channels, zero_init=True, dtype=self.dtype, name="out_conv")(h)

        if in_ch != self.out_channels:
            skip_conv = Conv2D(
                self.out_channels, kernel=(1, 1), dtype=self.dtype, name="skip"
            )
            if skip_in is not None:
                skip_conv(jnp.zeros((1, 1, 1, in_ch), x.dtype))
                sp = skip_conv.variables["params"]["Conv_0"]
                sk, sb = sp["kernel"], sp["bias"]
                x = (
                    jnp.einsum(
                        "bhwc,cf->bhwf", x.astype(self.dtype),
                        sk[0, 0, :cx].astype(self.dtype),
                    )
                    + jnp.einsum(
                        "bhwc,cf->bhwf", skip_in.astype(self.dtype),
                        sk[0, 0, cx:].astype(self.dtype),
                    )
                    + sb.astype(self.dtype)
                )
            else:
                x = skip_conv(x)
        elif skip_in is not None:
            # out_channels == concat width can't happen in this
            # architecture (decoder blocks always narrow), but keep the
            # math total: fall back to the explicit concat residual.
            x = jnp.concatenate([x, skip_in], axis=-1)
        return x + h


class UNet(nn.Module):
    """The conditional denoiser.

    forward(x_t [B,H,W,C], t [B], context_ids [B,L], writer_id [B],
            phosc_ids [B,P]?, style_vec [B,D]?) -> eps-hat [B,H,W,C]
    (+ ocr logits [T,B,K] when the aux head is enabled).
    """

    cfg: UNetConfig

    def _spatial_transformer(self, ch: int, name: str) -> SpatialTransformer:
        cfg = self.cfg
        dim_head = ch // cfg.num_heads
        return SpatialTransformer(
            in_channels=ch,
            n_heads=cfg.num_heads,
            d_head=dim_head,
            depth=cfg.transformer_depth,
            context_dim=cfg.context_dim,
            dropout=cfg.dropout,
            attn1_cross=cfg.attn1_cross,
            dtype=jnp.dtype(cfg.dtype),
            # auto (None): the fused FF kernel wins on TPU only; CPU
            # would run it in interpret mode for no benefit
            use_pallas_ffn=(
                jax.default_backend() == "tpu"
                if cfg.use_pallas_ffn is None else cfg.use_pallas_ffn
            ),
            fold_context=bool(cfg.attn_fold_context),
            sow_attn=cfg.return_attn,
            # auto (None): bf16 softmax intermediates on TPU; CPU keeps
            # the reference fp32 numerics (torch-parity tests)
            fast_softmax=(
                jax.default_backend() == "tpu"
                if cfg.fast_softmax is None else cfg.fast_softmax
            ),
            remat=cfg.remat,
            name=name,
        )

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        t: jax.Array,
        context_ids: Optional[jax.Array] = None,
        writer_id: Optional[jax.Array] = None,
        phosc_ids: Optional[jax.Array] = None,
        style_vec: Optional[jax.Array] = None,
        writer_mask: Optional[jax.Array] = None,
        writer_id2: Optional[jax.Array] = None,
        mix_rate: Optional[jax.Array] = None,
        cond_latents: Optional[jax.Array] = None,
        char_images: Optional[jax.Array] = None,
        deterministic: bool = True,
    ):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        time_embed_dim = cfg.model_channels * 4

        # --- conditioning ------------------------------------------------
        t_emb = timestep_embedding(t, cfg.model_channels)
        emb = Dense(time_embed_dim, dtype=dtype, name="time_mlp_1")(t_emb.astype(dtype))
        emb = Dense(time_embed_dim, dtype=dtype, name="time_mlp_2")(nn.silu(emb))

        if writer_id is not None:
            # clamp instead of silent NaN on out-of-range ids (torch
            # would device-assert; XLA gathers garbage)
            writer_id = jnp.clip(writer_id, 0, cfg.num_writers - 1)
            label_emb = nn.Embed(
                cfg.num_writers,
                time_embed_dim,
                dtype=dtype,
                param_dtype=jnp.float32,
                name="label_emb",
            )
            w_emb = label_emb(writer_id)
            if writer_id2 is not None and mix_rate is not None:
                # style interpolation between two writers
                # (``--interpolation`` + mix_rate, ``unetPhosc.py:
                # 1095-1112``)
                w2 = label_emb(jnp.clip(writer_id2, 0, cfg.num_writers - 1))
                r = jnp.asarray(mix_rate, w_emb.dtype).reshape(-1, 1)
                w_emb = (1.0 - r) * w_emb + r * w2
            if writer_mask is not None:
                # traced classifier-free drop of the writer conditioning
                # (reference ``train.py:284-285`` labels=None path)
                w_emb = w_emb * writer_mask[:, None].astype(w_emb.dtype)
            emb = emb + w_emb

        context = None
        if context_ids is not None:
            encoder = CharacterEncoder(
                vocab_size=cfg.vocab_size,
                hidden_size=cfg.context_dim,
                max_seq_len=cfg.max_seq_len,
                dtype=dtype,
                name="word_emb",
            )
            context = encoder(context_ids)
            if cfg.use_phosc and phosc_ids is not None:
                # PHOSC ints re-use the same encoder and extend the
                # sequence axis (``unetPhosc.py:1120-1134``).
                context = jnp.concatenate([context, encoder(phosc_ids)], axis=1)
            if cfg.style_vec_dim and style_vec is not None:
                style_tok = StyleProjection(
                    cfg.context_dim, dtype=dtype, name="style_proj"
                )(style_vec.astype(dtype))
                if cfg.style_replace_context:
                    # reference --wrdChrWrStyl 1: the projected style
                    # sequence REPLACES the char context
                    # (``unet.py:1628-1629``)
                    context = style_tok
                else:
                    context = jnp.concatenate([context, style_tok], axis=1)
            if cfg.use_char_images and char_images is not None:
                # glyph crops [B, L, gh, gw, 1] -> conv tokens appended
                # to the context (charImages path, ``unet.py:1517-1541``)
                b_, L, gh, gw, cc = char_images.shape
                g = char_images.reshape(b_ * L, gh, gw, cc).astype(dtype)
                g = Conv2D(32, strides=(2, 2), dtype=dtype, name="glyph_conv1")(g)
                g = nn.silu(g)
                g = Conv2D(64, strides=(2, 2), dtype=dtype, name="glyph_conv2")(g)
                g = nn.silu(g)
                g = g.mean(axis=(1, 2))
                g = Dense(cfg.context_dim, dtype=dtype, name="glyph_proj")(g)
                context = jnp.concatenate(
                    [context, g.reshape(b_, L, cfg.context_dim)], axis=1
                )

        # --- UNet trunk ---------------------------------------------------
        if cfg.img_conditioned and cond_latents is not None:
            # reference-latent conditioning: channel concat at conv_in
            x = jnp.concatenate([x, cond_latents.astype(x.dtype)], axis=-1)
        h = Conv2D(cfg.model_channels, dtype=dtype, name="conv_in")(x.astype(dtype))
        hs = [h]
        ch = cfg.model_channels
        ds = 1
        skip_chans = [ch]

        # input blocks
        for level, mult in enumerate(cfg.channel_mult):
            for i in range(cfg.num_res_blocks):
                ch = mult * cfg.model_channels
                h = ResBlock(
                    ch,
                    dropout=cfg.dropout,
                    scale_shift=cfg.use_scale_shift_norm,
                    dtype=dtype,
                    name=f"in_{level}_{i}_res",
                )(h, emb, deterministic)
                if ds in cfg.attention_resolutions:
                    h = self._spatial_transformer(ch, f"in_{level}_{i}_attn")(
                        h, context, deterministic
                    )
                hs.append(h)
                skip_chans.append(ch)
            if level != len(cfg.channel_mult) - 1:
                h = Downsample(ch, dtype=dtype, name=f"down_{level}")(h)
                hs.append(h)
                skip_chans.append(ch)
                ds *= 2

        # middle
        h = ResBlock(
            ch, dropout=cfg.dropout, scale_shift=cfg.use_scale_shift_norm, dtype=dtype, name="mid_res1",
        )(h, emb, deterministic)
        h = self._spatial_transformer(ch, "mid_attn")(h, context, deterministic)
        h = ResBlock(
            ch, dropout=cfg.dropout, scale_shift=cfg.use_scale_shift_norm, dtype=dtype, name="mid_res2",
        )(h, emb, deterministic)

        # output blocks
        split_skip = bool(cfg.split_skip_conv)  # None = off (measured
        # neutral in-program — configs/config.py)
        for level, mult in reversed(list(enumerate(cfg.channel_mult))):
            for i in range(cfg.num_res_blocks + 1):
                skip = hs.pop()
                cat_ch = h.shape[-1] + skip.shape[-1]
                gw = max(1, cat_ch // 32)  # GroupNorm32 group width
                can_split = (
                    split_skip
                    and cat_ch % 32 == 0
                    and h.shape[-1] % gw == 0
                )
                ch = cfg.model_channels * mult
                block = ResBlock(
                    ch, dropout=cfg.dropout, scale_shift=cfg.use_scale_shift_norm, dtype=dtype,
                    name=f"out_{level}_{i}_res",
                )
                if can_split:
                    h = block(h, emb, deterministic, skip_in=skip)
                else:
                    h = block(
                        jnp.concatenate([h, skip], axis=-1), emb, deterministic
                    )
                if ds in cfg.attention_resolutions:
                    h = self._spatial_transformer(ch, f"out_{level}_{i}_attn")(
                        h, context, deterministic
                    )
                if level and i == cfg.num_res_blocks:
                    h = Upsample(ch, dtype=dtype, name=f"up_{level}")(h)
                    ds //= 2

        h = GroupNorm32(name="out_norm")(h)
        h = nn.silu(h)
        eps = Conv2D(
            cfg.out_channels, zero_init=True, dtype=dtype, name="out_conv"
        )(h)
        eps = eps.astype(jnp.float32)

        if cfg.ocr_head:
            logits = CTCHead(
                hidden=cfg.ocr_hidden,
                layers=cfg.ocr_layers,
                nclasses=cfg.ocr_classes,
                norm=cfg.ocr_norm,
                dtype=dtype,
                name="aux_head",
            )(eps.astype(dtype), deterministic)
            return eps, logits
        return eps
