"""Pin the full-DDPM roofline claim with a re-derivable artifact.

BASELINE.md / BENCHMARKS.md claim one flagship denoiser call at B=128
accesses ~6.73 GB of HBM and ~8.7 GFLOP/img, bounding the 999-call DDPM
mode to ~15.6 imgs/s/chip at the v5e's ~819 GB/s. This script compiles
that exact call on the attached TPU and dumps XLA's own cost analysis to
``docs/roofline_cost_analysis.json`` so an auditor can re-derive the
bound: imgs/s <= 128 / (999 * bytes_accessed / HBM_BW).

Run on a TPU host: ``python scripts/roofline_dump.py``.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from worddiffusion_tpu.configs import presets
    from worddiffusion_tpu.models.unet import UNet

    import dataclasses

    assert jax.default_backend() == "tpu", "run this on the TPU host"
    B = 128
    hbm_bw = 819e9  # v5e HBM bandwidth, bytes/s
    exp = presets.get("iam")
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, 8, 32, 4), jnp.float32)
    t = jnp.full((B,), 100, jnp.int32)
    ctx = jax.random.randint(rng, (B, exp.data.max_chars), 0, 53)
    wid = jnp.ones((B,), jnp.int32)

    def analyse(use_pallas_ffn, note):
        model = UNet(dataclasses.replace(exp.unet, use_pallas_ffn=use_pallas_ffn))
        params = jax.eval_shape(model.init, rng, x[:1], t[:1], ctx[:1], wid[:1])
        params = jax.tree_util.tree_map(
            lambda l: jnp.zeros(l.shape, l.dtype), params
        )

        def call(p, xx):
            return model.apply(p, xx, t, ctx, wid)

        ca = jax.jit(call).lower(params, x).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
        byts = float(ca.get("bytes accessed", 0.0))
        return {
            "note": note,
            "flops": flops,
            "gflop_per_image": flops / B / 1e9,
            "bytes_accessed": byts,
            "gb_per_call": byts / 1e9,
            "memory_bound_time_per_call_ms": byts / hbm_bw * 1e3,
            "full_ddpm_roofline_imgs_per_s": B / (999 * byts / hbm_bw),
        }

    # Hand-counted HBM traffic of the fused-FFN pallas_calls the cost
    # model records as zero bytes (opaque custom call): x tile stream in
    # + out stream + one VMEM-resident load of each weight operand per
    # call (constant index maps). Recorded by tracing the exact apply.
    from worddiffusion_tpu.ops import ffn_pallas as fp

    k_model = UNet(dataclasses.replace(exp.unet, use_pallas_ffn=True))
    k_params = jax.eval_shape(
        k_model.init, rng, x[:1], t[:1], ctx[:1], wid[:1]
    )
    with fp.record_ffn_calls() as calls:
        jax.eval_shape(
            lambda p, xx: k_model.apply(p, xx, t, ctx, wid), k_params, x
        )
    kernel_bytes = fp.logged_call_hbm_bytes(calls)

    xla_only = analyse(False, "unfused FFN; all traffic XLA-visible")
    with_kernel = analyse(
        True, "fused FFN pallas_call opaque to the cost model; its bytes "
              "are counted by hand below"
    )
    corr_bytes = with_kernel["bytes_accessed"] + kernel_bytes
    kernel_flops = fp.logged_call_flops(calls)
    mxu_peak = 197e12  # v5e bf16
    corrected = {
        "note": "with_pallas_ffn + hand-counted kernel traffic — the "
                "pure-bandwidth roofline for the shipped sampler "
                "(kernel ON); see 'attainable' for the reachable bound",
        "pallas_ffn_calls": [
            {"rows": m, "d": d, "inner": inner, "weight_bytes": wb}
            for (m, d, inner, _, wb) in calls
        ],
        "pallas_ffn_bytes": kernel_bytes,
        "bytes_accessed": corr_bytes,
        "gb_per_call": corr_bytes / 1e9,
        "memory_bound_time_per_call_ms": corr_bytes / hbm_bw * 1e3,
        "full_ddpm_roofline_imgs_per_s": B / (999 * corr_bytes / hbm_bw),
    }
    # The pure-bandwidth ceiling above charges the kernel's bytes as if
    # they streamed concurrently with everything else. They don't: a
    # pallas_call runs alone on the core, streaming only its own ~44 MB
    # while executing its matmuls, so the kernel's MXU time is SERIAL
    # with the rest of the program's HBM streaming. The attainable bound
    # is therefore composite: (XLA-visible bytes / BW) + (kernel matmul
    # FLOPs / MXU peak) — what a PERFECT kernel implementation would
    # reach; the measured kernel (~61% MXU, BENCHMARKS.md round 3) sits
    # above its floor, and the decomposition
    # (docs/denoiser_time_decomposition.json) shows the pieces.
    serial_kernel_ms = kernel_flops / mxu_peak * 1e3
    attain_ms = with_kernel["bytes_accessed"] / hbm_bw * 1e3 + serial_kernel_ms
    corrected["attainable"] = {
        "pallas_ffn_matmul_flops": kernel_flops,
        "serial_kernel_mxu_floor_ms": serial_kernel_ms,
        "xla_visible_stream_ms": with_kernel["bytes_accessed"] / hbm_bw * 1e3,
        "attainable_time_per_call_ms": attain_ms,
        "attainable_full_ddpm_imgs_per_s": B / (999 * attain_ms / 1e3),
    }

    # Training step fwd+bwd (production config: fused FFN OFF inside the
    # Trainer — BENCHMARKS.md adoption policy), for the MFU / bound-%
    # the bench prints (round-5 verdict item 3).
    from worddiffusion_tpu.diffusion.schedule import NoiseSchedule
    from worddiffusion_tpu.train.state import TrainState, make_optimizer
    from worddiffusion_tpu.train.step import make_train_step

    t_model = UNet(dataclasses.replace(exp.unet, use_pallas_ffn=False))
    tx = make_optimizer(exp.train.lr)
    t_params = jax.tree_util.tree_map(
        lambda l: jnp.zeros(l.shape, l.dtype),
        jax.eval_shape(t_model.init, rng, x[:1], t[:1], ctx[:1], wid[:1]),
    )
    t_state = TrainState.create(t_params, tx)
    t_step = make_train_step(
        t_model, NoiseSchedule.linear(600), exp, tx
    )
    batch = {"latent": x, "context": ctx, "writer": wid}
    ca = (
        jax.jit(t_step)
        .lower(t_state, batch, jax.random.PRNGKey(0))
        .compile()
        .cost_analysis()
    )
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    t_flops = float(ca.get("flops", 0.0))
    t_bytes = float(ca.get("bytes accessed", 0.0))
    mxu_peak = 197e12  # v5e bf16
    train = {
        "program": "flagship jitted train step fwd+bwd, B=128 "
                   "(q_sample + UNet fwd/bwd + AdamW + EMA, fused FFN "
                   "off — the production Trainer path)",
        "flops": t_flops,
        "bytes_accessed": t_bytes,
        "mxu_peak_assumed_tflops": mxu_peak / 1e12,
        "mxu_bound_ms": t_flops / mxu_peak * 1e3,
        "hbm_bound_ms": t_bytes / hbm_bw * 1e3,
        "binding_resource": (
            "mxu" if t_flops / mxu_peak > t_bytes / hbm_bw else "hbm"
        ),
        "note": "measured ms/step vs these bounds -> the bound-% and "
                "MFU bench.py prints",
    }

    out = {
        "program": "flagship IAM denoiser forward, B=128 (one DDPM call)",
        "hbm_bw_assumed_gbps": hbm_bw / 1e9,
        "derivation": "imgs/s <= B / (999 calls * bytes_accessed / HBM_BW)",
        # The XLA-only program has every byte visible to the cost model.
        # With the fused FFN enabled the pallas_call is opaque (zero
        # bytes recorded), so 'corrected' adds the kernel's hand-counted
        # traffic — THAT is the ceiling for the shipped sampler.
        "xla_only": xla_only,
        "with_pallas_ffn": with_kernel,
        "corrected": corrected,
        "train_step": train,
    }
    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "roofline_cost_analysis.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
