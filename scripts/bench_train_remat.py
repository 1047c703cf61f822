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

    class _FullRematModel:
        """``model.apply`` wrapped in whole-forward ``jax.checkpoint``:
        the backward recomputes the UNet forward under ``policy``
        instead of reading stored activations — the only wrapper level
        that also covers the conv activations dominating the program's
        29.1 GB (the config-level ``remat`` only wraps the transformer
        blocks). Shim-level so the experiment needs no product change;
        signature restricted to what make_loss_fn passes for the iam
        preset (no aux head / phosc / style inputs)."""

        def __init__(self, model, policy):
            self._inner = jax.checkpoint(
                lambda p, xx, tt, cc, ww, wm: model.apply(
                    p, xx, tt, cc, ww, writer_mask=wm, deterministic=True
                ),
                policy=policy,
            )

        def apply(self, params, xx, tt, cc, ww, writer_mask=None, **kw):
            kw.pop("deterministic", None)
            assert all(v is None for v in kw.values()), kw
            return self._inner(params, xx, tt, cc, ww, writer_mask)

    def _variants():
        base = dataclasses.replace(exp.unet, use_pallas_ffn=False)
        yield "off", UNet(base), UNet(base)
        tb = dataclasses.replace(base, remat=True)
        yield "transformer_blocks", UNet(tb), UNet(tb)
        m = UNet(base)
        yield "full_nothing_saveable", m, _FullRematModel(
            m, jax.checkpoint_policies.nothing_saveable
        )
        m2 = UNet(base)
        yield "full_dots_saveable", m2, _FullRematModel(
            m2, jax.checkpoint_policies.dots_saveable
        )

    results = {}
    for name, init_model, step_model in _variants():
        params = fast_init(
            init_model.init, rng, x[:1], jnp.zeros((1,), jnp.int32), ctx[:1],
            batch["writer"][:1],
        )
        state = TrainState.create(params, tx)
        step = jax.jit(make_train_step(step_model, s600, exp, tx))
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
        results[name] = best * 1e3
        print(json.dumps({
            "variant": name,
            "ms_per_step": round(best * 1e3, 2),
            "imgs_per_s": round(BATCH / best, 0),
        }), flush=True)

    off = results["off"]
    for name, ms in results.items():
        if name != "off":
            print(json.dumps({
                "variant": name,
                "delta_pct": round((ms - off) / off * 100.0, 1),
                "verdict": "wins" if ms < off else "loses",
            }))


if __name__ == "__main__":
    main()
