"""Pallas kernel correctness (interpret mode on CPU; same kernel code
compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from worddiffusion_tpu.ops.attention_pallas import fused_attention


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
