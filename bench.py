"""Headline benchmark: sampled 64x256 word images / sec / chip at
1000-step full DDPM (driver north star: >= 50, BASELINE.json).

Runs the flagship IAM UNet (published 320ch config, bf16) through the
compiled ``lax.scan`` reverse loop on whatever accelerator jax exposes
(the real TPU v5e chip under the driver). Prints ONE json line.
"""

from __future__ import annotations

import json
import time


def main() -> None:
    import jax
    import jax.numpy as jnp

    from worddiffusion_tpu.configs import presets
    from worddiffusion_tpu.diffusion.sampler import ddpm_sample
    from worddiffusion_tpu.diffusion.schedule import NoiseSchedule
    from worddiffusion_tpu.models.unet import UNet

    BATCH = 128
    STEPS = 1000

    exp = presets.get("iam")
    model = UNet(exp.unet)
    schedule = NoiseSchedule.linear(STEPS)
    rng = jax.random.PRNGKey(0)

    x = jax.random.normal(rng, (BATCH, 8, 32, 4), jnp.float32)
    ctx = jax.random.randint(jax.random.fold_in(rng, 1), (BATCH, exp.data.max_chars), 0, 53)
    wid = jnp.ones((BATCH,), jnp.int32)
    params = model.init(
        rng, x[:1], jnp.zeros((1,), jnp.int32), ctx[:1], wid[:1]
    )

    def eps_fn(xx, tt):
        return model.apply(params, xx, tt, ctx, wid)

    @jax.jit
    def run(rng, x_init):
        return ddpm_sample(schedule, eps_fn, rng, x_init, stochastic=True)

    # warmup / compile
    out = jax.block_until_ready(run(rng, x))

    # best of 3 (the axon tunnel adds occasional dispatch jitter)
    dt = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        out = jax.block_until_ready(run(jax.random.fold_in(rng, 2 + rep), x))
        dt = min(dt, time.perf_counter() - t0)

    n_chips = jax.device_count()
    imgs_per_sec_chip = BATCH / dt / n_chips
    baseline = 50.0  # north-star imgs/sec/chip target
    print(
        json.dumps(
            {
                "metric": "sampled 64x256 word images/sec/chip @1000-step DDPM",
                "value": round(imgs_per_sec_chip, 2),
                "unit": "imgs/sec/chip",
                "vs_baseline": round(imgs_per_sec_chip / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
