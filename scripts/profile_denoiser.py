"""Per-call time decomposition of the flagship denoiser (round-5 #1).

The corrected HBM roofline (scripts/roofline_dump.py, 'corrected')
bounds one B=128 denoiser call to ~6.6 ms; the measured full-DDPM step
is ~8.8 ms. This script pins where the residual goes: it traces a
chained-call program with jax.profiler, parses the device plane with
jax.profiler.ProfileData, and aggregates XLA op self-times into named
buckets (convolution / matmul / fused FFN kernel / attention softmax /
GroupNorm+elementwise / copies / other), writing
``docs/denoiser_time_decomposition.json`` whose pieces sum to the
measured per-call wall.

Run on the TPU host: ``python scripts/profile_denoiser.py``.
"""

from __future__ import annotations

import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CALLS = 50  # denoiser calls inside the traced program


def build_program():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from worddiffusion_tpu.configs import presets
    from worddiffusion_tpu.models.unet import UNet
    from worddiffusion_tpu.utils.fastinit import fast_init

    exp = presets.get("iam")
    model = UNet(dataclasses.replace(exp.unet, use_pallas_ffn=True))
    rng = jax.random.PRNGKey(0)
    B = 128
    x = jax.random.normal(rng, (B, 8, 32, 4), jnp.float32)
    ctx = jax.random.randint(rng, (B, exp.data.max_chars), 0, 53)
    wid = jnp.ones((B,), jnp.int32)
    params = fast_init(
        model.init, rng, x[:1], jnp.zeros((1,), jnp.int32), ctx[:1], wid[:1]
    )

    @jax.jit
    def chained(p, x0):
        def body(i, xi):
            t = jnp.full((B,), 100, jnp.int32)
            out = model.apply(p, xi, t, ctx, wid)
            return (xi + 0.001 * out).astype(xi.dtype)

        return jax.lax.fori_loop(0, CALLS, body, x0)

    return chained, params, x


BUCKETS = [
    # (bucket, regex over the XLA op/event name, lowercased)
    ("pallas_fused_ffn", r"ln_ffn|ffn_kernel|custom-call|pallas|tpu_custom_call"),
    ("convolution", r"conv"),
    ("attention_matmul", r"dot|einsum|matmul"),
    ("reduce_norm_softmax", r"reduce|softmax|group_norm|rsqrt|variance"),
    ("copies_layout", r"copy|transpose|bitcast|reshape|concatenate|slice|pad"),
    ("fusion_elementwise", r"fusion|add|multiply|subtract|divide|tanh|exp|convert"),
]


def bucket_of(name: str) -> str:
    low = name.lower()
    for b, pat in BUCKETS:
        if re.search(pat, low):
            return b
    return "other"


def main() -> None:
    import jax

    assert jax.default_backend() == "tpu", "run this on the TPU host"
    chained, params, x = build_program()
    out = chained(params, x)
    out.block_until_ready()
    # measured wall for the same program (best of 3)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        chained(params, x).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    per_call_ms = best / CALLS * 1e3
    print(f"measured: {per_call_ms:.3f} ms/call ({CALLS} chained)", file=sys.stderr)

    tdir = tempfile.mkdtemp(prefix="wd_prof_")
    jax.profiler.start_trace(tdir)
    chained(params, x).block_until_ready()
    jax.profiler.stop_trace()

    pd = jax.profiler.ProfileData.from_serialized_xspace(_load_xspace(tdir))
    agg: dict[str, float] = {}
    ops: dict[str, float] = {}
    total_ns = 0.0
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        for line in plane.lines:
            lname = line.name.lower()
            # device op lines only (skip step/module/queue summary lines)
            if "xla op" not in lname and "ops" != lname and "op" not in lname:
                continue
            for ev in line.events:
                dur = ev.duration_ns
                name = ev.name
                total_ns += dur
                agg[bucket_of(name)] = agg.get(bucket_of(name), 0.0) + dur
                ops[name] = ops.get(name, 0.0) + dur
    top = sorted(ops.items(), key=lambda kv: -kv[1])[:25]
    result = {
        "program": f"{CALLS} chained flagship denoiser calls, B=128, fused FFN on",
        "measured_ms_per_call": per_call_ms,
        "device_total_ms_per_call": total_ns / 1e6 / CALLS,
        "buckets_ms_per_call": {
            k: v / 1e6 / CALLS for k, v in sorted(agg.items(), key=lambda kv: -kv[1])
        },
        "top_ops_ms_per_call": [
            {"op": k, "ms": v / 1e6 / CALLS} for k, v in top
        ],
    }
    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "denoiser_time_decomposition.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: result[k] for k in
                      ("measured_ms_per_call", "device_total_ms_per_call",
                       "buckets_ms_per_call")}, indent=1))


def _load_xspace(tdir: str) -> bytes:
    for root, _, files in os.walk(tdir):
        for f in files:
            if f.endswith(".xplane.pb"):
                with open(os.path.join(root, f), "rb") as fh:
                    return fh.read()
    raise FileNotFoundError(f"no .xplane.pb under {tdir}")


if __name__ == "__main__":
    main()
