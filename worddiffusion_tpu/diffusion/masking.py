"""Inpainting-style latent masking (the ``sampling4.py`` experiments).

Rebuild of ``Diffusion.masking`` (``sampling4.py:136-175``) and the
masked deterministic reverse loop (``sampling4.py:182-334``):

- the mask derives from reference latents: channel-mean > (1 - t/T)
  — at high t almost everything is "fixed", at low t almost everything
  is free;
- the binary mask is dilated with a timestep-dependent max-pool window
  (``dilate_size = int(1.68 * t / T)``);
- the reverse update keeps masked regions pinned to the (re-noised)
  reference latent and lets unmasked regions evolve.

TPU note: the dilation window size is data-independent but *step*-
dependent; to keep one compiled scan we dilate with the maximum window
and modulate via iota-masked reduce, trading a few VPU ops for zero
recompilation.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .forward import q_sample
from .schedule import NoiseSchedule


def timestep_mask(
    ref_latents: jax.Array, t: jax.Array, num_steps: int, dilate_scale: float = 1.68
) -> jax.Array:
    """[B,H,W,C], scalar t -> dilated binary mask [B,H,W,1]."""
    m = jnp.mean(ref_latents, axis=-1, keepdims=True)
    thresh = 1.0 - t.astype(jnp.float32) / num_steps
    mask = (m > thresh).astype(ref_latents.dtype)
    # timestep-dependent dilation with a static max window:
    max_d = max(1, int(dilate_scale))
    dilated = jax.lax.reduce_window(
        mask, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 2 * max_d + 1, 2 * max_d + 1, 1),
        window_strides=(1, 1, 1, 1),
        padding="SAME",
    )
    d_size = (dilate_scale * t.astype(jnp.float32) / num_steps).astype(jnp.int32)
    return jnp.where(d_size > 0, dilated, mask)


def masked_ddpm_sample(
    schedule: NoiseSchedule,
    eps_fn: Callable,
    rng: jax.Array,
    ref_latents: jax.Array,
    x_init: Optional[jax.Array] = None,
    snapshot_every: int = 0,
) -> tuple[jax.Array, Optional[jax.Array]]:
    """Deterministic masked reverse process: masked (fixed) regions
    track q_sample(ref, t), free regions follow the denoiser. Returns
    (final latent, optional stacked intermediate snapshots)."""
    T = schedule.num_steps
    alpha = jnp.asarray(schedule.alpha)
    alpha_hat = jnp.asarray(schedule.alpha_hat)
    x0 = (
        x_init
        if x_init is not None
        else jax.random.normal(rng, ref_latents.shape, jnp.float32)
    )

    def step(x, i):
        t = jnp.full((x.shape[0],), i, jnp.int32)
        eps = eps_fn(x, t)
        a = alpha[i]
        ah = alpha_hat[i]
        x = (x - ((1.0 - a) / jnp.sqrt(1.0 - ah)) * eps) / jnp.sqrt(a)
        # pin masked region to the re-noised reference at t-1
        noise = jax.random.normal(jax.random.fold_in(rng, i), x.shape, x.dtype)
        ref_t = q_sample(schedule, ref_latents, jnp.maximum(t - 1, 0), noise)
        mask = timestep_mask(ref_latents, i, T)
        x = mask * ref_t + (1.0 - mask) * x
        snap = x if snapshot_every else None
        return x, snap

    steps = jnp.arange(T - 1, 0, -1)
    if snapshot_every:
        x, snaps = jax.lax.scan(step, x0, steps)
        return x, snaps[:: snapshot_every]
    x, _ = jax.lax.scan(step, x0, steps)
    return x, None
