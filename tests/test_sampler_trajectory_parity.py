"""FULL-TRAJECTORY sampler parity vs the actual torch reference.

Per-call parity (<2e-4, ``test_convert_research.py``) does not prove
the composed reverse loop: the reference's regeneration runs 599
deterministic skip-schedule steps (``regenerateFromtrain2.py:465-648``)
whose quirks — t in [1, T) with t=0 never visited, stale-eps reuse
between scheduled calls, noise zeroed at i<=1, the deterministic
no-noise update — accumulate error multiplicatively (the 1/sqrt(alpha)
gain across 599 steps is ~20x). This file ports the reference loop
verbatim into torch (the reference module itself imports cluster-only
packages, so the loop body is re-stated from
``regenerateFromtrain2.py:523-618``), instantiates the actual
``/root/reference/unet.py:1096`` UNetModel, converts its weights, and
runs BOTH reverse trajectories from identical init noise:

- deterministic skip-schedule regen mode (the production path), and
- stochastic full-sampling mode with bit-identical injected noise.

This is the strongest achievable stand-in for the unmeasurable
"FID within 5%" north star in this environment (VERDICT r2 next #1).
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(REFERENCE), reason="reference tree not mounted"
    ),
]

T_STEPS = 600  # Diffusion hardcodes 600 (regenerateFromtrain2.py:439)


def _torch_reference_loop(model, x, ctx, y, mask, stochastic, noises=None):
    """Verbatim port of ``Diffusion.sampling3``'s reverse loop
    (``regenerateFromtrain2.py:523-618``): linear beta 1e-4->0.02 over
    600 steps, i = 599..1, model called only where ``mask[i]`` (stale
    eps reused otherwise), noise zeroed at i<=1, and the deterministic
    update (no noise term) unless ``stochastic``/fullSampling."""
    import torch

    beta = torch.linspace(1e-4, 0.02, T_STEPS)
    alpha = 1.0 - beta
    alpha_hat = torch.cumprod(alpha, dim=0)
    prev_eps = None
    with torch.no_grad():
        for i in reversed(range(1, T_STEPS)):
            t = torch.full((x.shape[0],), i, dtype=torch.long)
            if mask[i]:
                prev_eps = model(x, None, timesteps=t, context=ctx, y=y)
            a, ah, b = alpha[i], alpha_hat[i], beta[i]
            x = 1.0 / torch.sqrt(a) * (
                x - ((1.0 - a) / torch.sqrt(1.0 - ah)) * prev_eps
            )
            if stochastic:
                n = noises[i] if i > 1 else torch.zeros_like(x)
                x = x + torch.sqrt(b) * n
    return x


def _build_pair(seed=0):
    """Reference UNetModel + converted Flax params + shared inputs."""
    import torch

    from test_convert_research import _load_research_model, _our_cfg

    from worddiffusion_tpu.models.convert import convert_reference_unet
    from worddiffusion_tpu.models.unet import UNet

    torch.manual_seed(seed)
    ref = _load_research_model(model_channels=32, context_dim=32, num_heads=4)
    cfg = _our_cfg(model_channels=32, context_dim=32, num_heads=4)
    params = convert_reference_unet(
        {k: v.numpy() for k, v in ref.state_dict().items()}, cfg
    )
    model = UNet(cfg)

    x0 = torch.randn(2, 4, 8, 32)
    ctx = torch.randint(0, 53, (2, 10))
    y = torch.tensor([0, 3])
    return ref, model, params, x0, ctx, y


def _jax_trajectory(model, params, x0, ctx, y, mask, stochastic, noises=None):
    import jax
    import jax.numpy as jnp

    from worddiffusion_tpu.diffusion.sampler import ddpm_sample
    from worddiffusion_tpu.diffusion.schedule import NoiseSchedule

    schedule = NoiseSchedule.linear(T_STEPS, 1e-4, 0.02)
    ctx_j = jnp.asarray(ctx.numpy())
    y_j = jnp.asarray(y.numpy())

    def eps_fn(xx, tt):
        return model.apply(params, xx, tt, ctx_j, y_j)

    noise_seq = None
    if noises is not None:
        # [T, B, H, W, C]: timestep-indexed, NHWC
        noise_seq = jnp.asarray(
            np.stack([n.numpy().transpose(0, 2, 3, 1) for n in noises])
        )
    lat = ddpm_sample(
        schedule,
        eps_fn,
        jax.random.PRNGKey(0),  # unused when noise_seq is injected
        jnp.asarray(x0.numpy().transpose(0, 2, 3, 1)),
        stochastic=stochastic,
        call_mask=mask,
        noise_seq=noise_seq,
    )
    # NHWC -> NCHW for comparison
    return np.transpose(np.asarray(lat), (0, 3, 1, 2))


def test_deterministic_skip_schedule_trajectory_parity():
    """The production regen mode: 599 steps, ~121 model calls, stale-eps
    reuse, deterministic update. Final latents must agree closely after
    the full composed loop."""
    from worddiffusion_tpu.diffusion.sampler import regen_call_mask

    ref, model, params, x0, ctx, y = _build_pair(seed=10)
    mask = regen_call_mask(T_STEPS, epoch=0, full_sampling=False)
    # sanity: the schedule really is sparse (~121 of 599 calls)
    assert 100 < mask[1:].sum() < 140

    ref_final = _torch_reference_loop(
        ref, x0.clone(), ctx, y, mask, stochastic=False
    ).numpy()
    ours_final = _jax_trajectory(model, params, x0, ctx, y, mask, False)

    diff = np.abs(ours_final - ref_final).max()
    scale = np.abs(ref_final).max()
    # per-call conv/attn reassociation (<2e-4) amplified by ~20x through
    # the 599-step loop: observed ~1e-3; generous 10x margin
    assert diff < 1e-2, f"max abs diff {diff} (ref scale {scale})"
    corr = np.corrcoef(ours_final.ravel(), ref_final.ravel())[0, 1]
    assert corr > 0.99999, f"trajectory decorrelated: corr={corr}"


def test_stochastic_full_sampling_trajectory_parity():
    """fullSampling mode: every step calls the model and injects noise;
    both frameworks get bit-identical noise tensors."""
    import torch

    ref, model, params, x0, ctx, y = _build_pair(seed=11)
    mask = np.ones(T_STEPS, dtype=bool)

    g = torch.Generator().manual_seed(123)
    noises = [torch.randn(x0.shape, generator=g) for _ in range(T_STEPS)]

    ref_final = _torch_reference_loop(
        ref, x0.clone(), ctx, y, mask, stochastic=True, noises=noises
    ).numpy()
    ours_final = _jax_trajectory(
        model, params, x0, ctx, y, mask, True, noises=noises
    )

    diff = np.abs(ours_final - ref_final).max()
    assert diff < 1e-2, f"max abs diff {diff}"
    corr = np.corrcoef(ours_final.ravel(), ref_final.ravel())[0, 1]
    assert corr > 0.99999, f"trajectory decorrelated: corr={corr}"
