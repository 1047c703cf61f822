"""Forward (noising) process and timestep sampling — pure jittable fns.

``q_sample`` matches ``Diffusion.noise_images``
(``trainModifyCondition.py:531-535``); ``sample_timesteps`` matches
``Diffusion.sample_timesteps`` (``:538``) including the reference's
``[1, T)`` support (t=0 is never trained on).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .schedule import NoiseSchedule


def q_sample(
    schedule: NoiseSchedule,
    x0: jax.Array,
    t: jax.Array,
    noise: jax.Array,
) -> jax.Array:
    """x_t = sqrt(a-hat_t) x0 + sqrt(1 - a-hat_t) eps.  x0: [B,H,W,C], t: [B]."""
    sqrt_ah = jnp.asarray(schedule.sqrt_alpha_hat)[t]
    sqrt_omah = jnp.asarray(schedule.sqrt_one_minus_alpha_hat)[t]
    shape = (-1,) + (1,) * (x0.ndim - 1)
    return sqrt_ah.reshape(shape) * x0 + sqrt_omah.reshape(shape) * noise


def sample_timesteps(
    schedule: NoiseSchedule, rng: jax.Array, batch: int
) -> jax.Array:
    """t ~ Uniform{1, ..., T-1} (reference excludes t=0)."""
    return jax.random.randint(rng, (batch,), 1, schedule.num_steps)
