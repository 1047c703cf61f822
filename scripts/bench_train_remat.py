"""Measure the flagship train step with transformer-block remat on/off.

Round-5 VERDICT item 3 follow-through: the fwd+bwd program is pinned
HBM-bound (29.1 GB -> 35.5 ms bound, measured ~99% of it), with ~2x
headroom on the MXU side (17.0 ms bound). ``UNetConfig.remat`` wraps
``BasicTransformerBlock`` in ``jax.checkpoint`` — trading stored
activations (bytes) for recompute (FLOPs), the one lever that can move
an HBM-bound program. This script times both variants with bench.py's
exact discipline (B=128, dispatch-10, sync-once, best of the steady
run) and prints a JSON line per variant.

Run:  python scripts/bench_train_remat.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from worddiffusion_tpu.configs import presets
    from worddiffusion_tpu.diffusion.schedule import NoiseSchedule
    from worddiffusion_tpu.models.unet import UNet
    from worddiffusion_tpu.train.state import TrainState, make_optimizer
    from worddiffusion_tpu.train.step import make_train_step
    from worddiffusion_tpu.utils.fastinit import fast_init

    BATCH = 128
    exp = presets.get("iam")
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (BATCH, 8, 32, 4), jnp.float32)
    ctx = jax.random.randint(rng, (BATCH, exp.data.max_chars), 0, 53)
    batch = {
        "latent": x,
        "context": ctx,
        "writer": jnp.asarray(np.ones((BATCH,), np.int32)),
    }
    s600 = NoiseSchedule.linear(600)
    tx = make_optimizer(exp.train.lr)
    fold = lambda i: jax.random.fold_in(rng, i)

    results = {}
    for remat in (False, True):
        cfg = dataclasses.replace(exp.unet, use_pallas_ffn=False, remat=remat)
        model = UNet(cfg)
        params = fast_init(
            model.init, rng, x[:1], jnp.zeros((1,), jnp.int32), ctx[:1],
            batch["writer"][:1],
        )
        state = TrainState.create(params, tx)
        step = jax.jit(make_train_step(model, s600, exp, tx))
        state, m = step(state, batch, fold(0))  # compile
        jax.block_until_ready(m["loss"])
        best = float("inf")
        for rep in range(3):
            st = state
            T = 10
            t0 = time.perf_counter()
            for i in range(T):
                st, m = step(st, batch, fold(1 + rep * T + i))
            float(m["loss"])  # sync
            best = min(best, (time.perf_counter() - t0) / T)
        results[f"remat={remat}"] = best * 1e3
        print(json.dumps({
            "variant": f"remat={remat}",
            "ms_per_step": round(best * 1e3, 2),
            "imgs_per_s": round(BATCH / best, 0),
        }), flush=True)

    off, on = results["remat=False"], results["remat=True"]
    print(json.dumps({
        "delta_pct": round((on - off) / off * 100.0, 1),
        "verdict": "remat wins" if on < off else "remat loses",
    }))


if __name__ == "__main__":
    main()
