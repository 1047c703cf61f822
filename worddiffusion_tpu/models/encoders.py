"""Conditioning encoders: character sequence, writer style projection.

Rewrites ``unet.py:815-882`` (Word_Attention + CharacterEncoder). The
reference's Word_Attention is a single-head attention with *no* 1/sqrt(d)
scaling and biased q/k/v projections — preserved exactly, since it shapes
the learned conditioning distribution.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Dense, char_positional_encoding

Dtype = Any


class WordAttention(nn.Module):
    """Single-head, unscaled self-attention (``unet.py:815-836``)."""

    hidden_size: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        q = Dense(self.hidden_size, dtype=self.dtype, name="linear_query")(x)
        k = Dense(self.hidden_size, dtype=self.dtype, name="linear_key")(x)
        v = Dense(self.hidden_size, dtype=self.dtype, name="linear_value")(x)
        scores = jnp.einsum(
            "bid,bjd->bij", q, k, preferred_element_type=jnp.float32
        )
        scores = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        return jnp.einsum(
            "bij,bjd->bid", scores, v, preferred_element_type=jnp.float32
        ).astype(v.dtype)


class CharacterEncoder(nn.Module):
    """Char-id embedding + sinusoidal position + WordAttention
    (``unet.py:839-882``). Also embeds integer PHOSC descriptors when the
    phosc variant concatenates them on the sequence axis
    (``unetPhosc.py:1120-1134``) — same embedding table, like the
    reference reusing ``word_emb``."""

    vocab_size: int
    hidden_size: int
    max_seq_len: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, ids: jax.Array) -> jax.Array:
        # ids: [B, L] int32
        emb = nn.Embed(
            self.vocab_size,
            self.hidden_size,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="embedding",
        )(ids)
        L = ids.shape[1]
        if L <= self.max_seq_len:
            pe = char_positional_encoding(self.max_seq_len, self.hidden_size)
            emb = emb + pe[:L].astype(emb.dtype)
        # else: reference skips positional encoding entirely
        # (``unetPhosc.py:726-729``)
        return WordAttention(self.hidden_size, dtype=self.dtype, name="attention")(emb)


class StyleProjection(nn.Module):
    """Writer-style feature vector (e.g. 4096-d) -> context tokens
    (``unet.py:1243`` wrd_proj). The projected vector joins the text
    context as one extra token."""

    context_dim: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, style_vec: jax.Array) -> jax.Array:
        # style_vec: [B, D] -> [B, 1, context_dim], or [B, S, D] ->
        # [B, S, context_dim] (the cropStyleDict entries are per-image
        # token sequences, ``trainModifyCondition.py:466-468``)
        out = Dense(self.context_dim, dtype=self.dtype, name="wrd_proj")(style_vec)
        return out if out.ndim == 3 else out[:, None, :]
