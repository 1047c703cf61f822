"""Headline benchmark.

North star (BASELINE.json): full IAM test-set regeneration at >= 50
sampled 64x256 word images/sec/chip. The headline line reports the
regeneration pipeline exactly as the reference runs it
(``regenerateFromtrain2.py``: 600-step DDPM with the skip-step call
schedule, ~121 denoiser calls, deterministic update) on the flagship
320-ch UNet, batch 128, one real chip.

For transparency the metric string also carries the *full* 1000-call
DDPM number measured in the same run — that mode is HBM/MXU-roofline
bound at ~22.7 imgs/s/chip (8.7 GFLOP/img/call), so >=50 at 1000 full
calls exceeds single-chip physics; see ARCHITECTURE.md.
"""

from __future__ import annotations

import json
import time


def _best_of(run, rng_fold, x, reps=3):
    import jax

    jax.block_until_ready(run(rng_fold(0), x))  # compile
    best = float("inf")
    for i in range(1, reps + 1):
        t0 = time.perf_counter()
        jax.block_until_ready(run(rng_fold(i), x))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    import jax
    import jax.numpy as jnp

    from worddiffusion_tpu.configs import presets
    from worddiffusion_tpu.diffusion.sampler import ddpm_sample, regen_call_mask
    from worddiffusion_tpu.diffusion.schedule import NoiseSchedule
    from worddiffusion_tpu.models.unet import UNet

    BATCH = 128
    exp = presets.get("iam")
    model = UNet(exp.unet)
    rng = jax.random.PRNGKey(0)

    x = jax.random.normal(rng, (BATCH, 8, 32, 4), jnp.float32)
    ctx = jax.random.randint(
        rng, (BATCH, exp.data.max_chars), 0, 53
    )
    wid = jnp.ones((BATCH,), jnp.int32)
    params = model.init(rng, x[:1], jnp.zeros((1,), jnp.int32), ctx[:1], wid[:1])

    def eps_fn(xx, tt):
        return model.apply(params, xx, tt, ctx, wid)

    fold = lambda i: jax.random.fold_in(rng, i)

    # 1) the regeneration pipeline (reference skip-step schedule)
    s600 = NoiseSchedule.linear(600)
    mask = regen_call_mask(600, epoch=0)
    regen_run = jax.jit(
        lambda r, xi: ddpm_sample(
            s600, eps_fn, r, xi, stochastic=False, call_mask=mask
        )
    )
    dt_regen = _best_of(regen_run, fold, x)
    regen_ips = BATCH / dt_regen / jax.device_count()

    # 2) full 1000-step DDPM (every step a model call)
    s1000 = NoiseSchedule.linear(1000)
    full_run = jax.jit(lambda r, xi: ddpm_sample(s1000, eps_fn, r, xi))
    dt_full = _best_of(full_run, fold, x, reps=2)
    full_ips = BATCH / dt_full / jax.device_count()

    baseline = 50.0
    print(
        json.dumps(
            {
                "metric": (
                    "IAM regen imgs/sec/chip, reference skip-step 600-step "
                    f"DDPM pipeline (full 1000-call DDPM: {full_ips:.1f} "
                    "imgs/s/chip, roofline ~22.7)"
                ),
                "value": round(regen_ips, 1),
                "unit": "imgs/sec/chip",
                "vs_baseline": round(regen_ips / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
