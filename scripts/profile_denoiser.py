"""Per-call time decomposition of the flagship denoiser (round-5 #1).

The corrected HBM roofline (scripts/roofline_dump.py, 'corrected')
bounds one B=128 denoiser call to ~6.6 ms; the measured full-DDPM step
is ~8.8 ms. This script pins where the residual goes: it traces a
chained-call program with jax.profiler, maps each XLA op back to its
model layer via the compiled HLO's op_name metadata, and aggregates
LEAF op self-times (container ops like the fori_loop `while` wrap every
child and must be excluded, or the total double-counts) into component
buckets, writing ``docs/denoiser_time_decomposition.json`` whose pieces
sum to the measured per-call device time.

What it established (round 5, one idle v5e chip): the 9.05 ms device
call is NOT a norm/elementwise problem — XLA output-fuses every
GroupNorm statistics reduce into the producing convolution
(`convert_reduce_fusion`, conv emitter `EmitInputBatchInLanes`), so the
program is ~72% MXU time running at 75-88% MXU efficiency:

    conv_3x3            4.86 ms   (75-88% MXU; the two 640-ch concat
                                   in_convs are 121 GFLOP each at ~75%)
    attention_inner     1.78 ms   (~0.75 ms essential matmul time; rest
                                   is fp32 softmax islands, layout
                                   copies, per-head slivers)
    ffn_pallas          1.70 ms   (78% MXU)
    conv_1x1_skip_proj  0.52 ms
    small_other+embed   0.19 ms

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


def bucket_of(layer: str, op: str) -> str:
    """Component bucket for a leaf op, keyed on the HLO op_name metadata
    (the model layer path) rather than the XLA op spelling — the op
    spelling lies (a `convert_reduce_fusion` is a convolution)."""
    if "pallas_call" in layer:
        return "ffn_pallas"
    if "conv_general_dilated" in layer:
        if "skip" in layer or "proj_in" in layer or "proj_out" in layer:
            return "conv_1x1_skip_proj"
        return "conv_3x3"
    if re.search(r"attn[12]?/", layer):
        return "attention_inner"
    if op.startswith("copy"):
        return "copy"
    if "word_emb" in layer or "time_emb" in layer or "emb" in layer:
        return "embed"
    return "small_other"


def leaf_events(pd):
    """Leaf (self-time) events from the device XLA Ops line: an event
    that strictly contains the next event's start is a container (the
    chained program's `while`) and is dropped."""
    evs = []
    for plane in pd.planes:
        if plane.name != "/device:TPU:0":
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            evs = [(e.start_ns, e.duration_ns, e.name) for e in line.events]
    evs.sort()
    leaves = []
    for i, (s, d, n) in enumerate(evs):
        if i + 1 < len(evs) and evs[i + 1][0] < s + d:
            continue
        leaves.append((d, n.split(" = ")[0].strip("%")))
    return leaves


def main() -> None:
    import jax

    assert jax.default_backend() == "tpu", "run this on the TPU host"
    chained, params, x = build_program()

    # op name -> (layer metadata, conv emitter, cost-model cycles)
    hlo = chained.lower(params, x).compile().as_text()
    meta: dict[str, tuple[str, str, int]] = {}
    for m in re.finditer(r"%(\S+) = [^\n]*", hlo):
        line, name = m.group(0), m.group(1)
        opn = re.search(r'op_name="([^"]+)"', line)
        em = re.search(r'"emitter":"(\w+)"', line)
        cyc = re.search(r'"estimated_cycles":"(\d+)"', line)
        layer = opn.group(1) if opn else ""
        layer = layer.split("/UNet/")[-1] if "/UNet/" in layer else layer
        meta[name] = (
            layer,
            em.group(1) if em else "",
            int(cyc.group(1)) if cyc else 0,
        )

    out = chained(params, x)
    out.block_until_ready()
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
    leaves = leaf_events(pd)

    agg: dict[str, float] = {}
    ops: dict[str, float] = {}
    for d, n in leaves:
        layer, _, _ = meta.get(n, ("?", "", 0))
        b = bucket_of(layer, n)
        agg[b] = agg.get(b, 0.0) + d
        ops[n] = ops.get(n, 0.0) + d
    device_ms = sum(agg.values()) / 1e6 / CALLS
    top = sorted(ops.items(), key=lambda kv: -kv[1])[:25]
    result = {
        "program": f"{CALLS} chained flagship denoiser calls, B=128, fused FFN on",
        "measured_ms_per_call": per_call_ms,
        "device_leaf_total_ms_per_call": device_ms,
        "buckets_ms_per_call": {
            k: v / 1e6 / CALLS
            for k, v in sorted(agg.items(), key=lambda kv: -kv[1])
        },
        "top_ops_ms_per_call": [
            {
                "op": k,
                "ms": v / 1e6 / CALLS,
                "layer": meta.get(k, ("?", "", 0))[0][:90],
                "emitter": meta.get(k, ("?", "", 0))[1],
                "cost_model_ms": meta.get(k, ("?", "", 0))[2] / 940e3,
            }
            for k, v in top
        ],
    }
    path = os.path.join(
        os.path.dirname(__file__), "..", "docs", "denoiser_time_decomposition.json"
    )
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(
        json.dumps(
            {
                k: result[k]
                for k in (
                    "measured_ms_per_call",
                    "device_leaf_total_ms_per_call",
                    "buckets_ms_per_call",
                )
            },
            indent=1,
        )
    )


def _load_xspace(tdir: str) -> bytes:
    for root, _, files in os.walk(tdir):
        for f in files:
            if f.endswith(".xplane.pb"):
                with open(os.path.join(root, f), "rb") as fh:
                    return fh.read()
    raise FileNotFoundError(f"no .xplane.pb under {tdir}")


if __name__ == "__main__":
    main()
