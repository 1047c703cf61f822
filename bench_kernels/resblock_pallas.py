"""Pallas block-level ResBlock-prologue mega-kernel: GroupNorm -> SiLU
-> conv3x3 (SAME) in ONE VMEM-resident pass per batch row.

Motivation (BENCHMARKS.md "full-DDPM roofline"): the sampler is
HBM-bound at 6.73 GB/call and the declared remaining lever for the last
10% was a GN+SiLU+conv fusion. XLA materialises the normalised
activation between the GroupNorm and the conv (one extra bf16
write+read of [B, H, W, C] per ResBlock prologue); this kernel keeps it
in VMEM:

- per-group statistics stay lane-aligned via the [C, G] one-hot matmul
  trick of ``groupnorm_pallas.py`` (10 channels/group would otherwise
  fragment the 128-lane dim);
- the 3x3 SAME conv runs as 9 shifted [H*W, C] x [C, C] MXU matmuls
  accumulated in fp32 — at the flagship shape (8x32 spatial, 320 ch)
  that is 9 x (256x320x320) per image, all operands VMEM-resident
  (weights 1.8 MB bf16, padded activation 435 KB fp32).

VERDICT r2 next #7b asked for this to be MEASURED at B=128 rather than
extrapolated; ``python -m worddiffusion_tpu.ops.resblock_pallas``
benches it against the XLA baseline on the current backend and prints
both. Measured on the real chip (2026-08-18): 0.665 ms fused vs
0.521 ms XLA per op — the per-image grid underfills the MXU and the
fusion loses 28%, so it stays UNWIRED (see BENCHMARKS.md round-3
negative results).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, mask_ref, maskT_ref, gn_scale_ref, gn_bias_ref,
            w_ref, b_ref, o_ref, *, eps: float, n_per_group: float,
            H: int, W: int, C: int):
    x = x_ref[0].astype(jnp.float32)                     # [H, W, C]
    s = x.reshape(H * W, C)
    mask = mask_ref[:]                                   # [C, G]
    s1 = jnp.dot(jnp.sum(s, axis=0, keepdims=True), mask,
                 preferred_element_type=jnp.float32)     # [1, G]
    s2 = jnp.dot(jnp.sum(jnp.square(s), axis=0, keepdims=True), mask,
                 preferred_element_type=jnp.float32)
    mu = s1 / n_per_group
    var = s2 / n_per_group - jnp.square(mu)
    inv = jax.lax.rsqrt(var + eps)
    mu_c = jnp.dot(mu, maskT_ref[:], preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv, maskT_ref[:], preferred_element_type=jnp.float32)
    act = (s - mu_c) * (inv_c * gn_scale_ref[:]) + gn_bias_ref[:]
    act = act * jax.nn.sigmoid(act)                      # SiLU
    act = act.reshape(H, W, C)
    # zero-pad AFTER the activation (conv SAME semantics)
    pad = jnp.pad(act, ((1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((H * W, C), jnp.float32)
    for dh in range(3):
        for dw in range(3):
            win = jax.lax.slice(
                pad, (dh, dw, 0), (dh + H, dw + W, C)
            ).reshape(H * W, C)
            acc += jnp.dot(
                win.astype(jnp.bfloat16), w_ref[dh, dw],
                preferred_element_type=jnp.float32,
            )
    acc += b_ref[:]
    o_ref[0] = acc.reshape(H, W, C).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_groups", "eps", "interpret")
)
def fused_gn_silu_conv3x3(
    x: jax.Array,           # [B, H, W, C]
    gn_scale: jax.Array,    # [C]
    gn_bias: jax.Array,     # [C]
    w: jax.Array,           # [3, 3, C, C] (HWIO)
    b: jax.Array,           # [C]
    num_groups: int = 32,
    eps: float = 1e-5,
    interpret: bool | None = None,
) -> jax.Array:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, W, C = x.shape
    g = min(num_groups, C)
    assert C % g == 0 and w.shape == (3, 3, C, C)

    mask = jnp.asarray(np.kron(np.eye(g), np.ones((C // g, 1))), jnp.float32)
    maskT = mask.T.copy()

    return pl.pallas_call(
        functools.partial(
            _kernel, eps=eps, n_per_group=float(H * W * (C // g)),
            H=H, W=W, C=C,
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, g), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, C, C), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        interpret=interpret,
    )(
        x,
        mask, maskT,
        gn_scale.astype(jnp.float32).reshape(1, C),
        gn_bias.astype(jnp.float32).reshape(1, C),
        w.astype(jnp.bfloat16),
        b.astype(jnp.float32).reshape(1, C),
    )


def xla_reference(x, gn_scale, gn_bias, w, b, num_groups=32, eps=1e-5):
    """The XLA baseline this kernel must beat: GN (fp32 stats) -> SiLU
    -> conv_general_dilated SAME, matching the model's ResBlock."""
    B, H, W, C = x.shape
    g = min(num_groups, C)
    xf = x.astype(jnp.float32).reshape(B, H * W, g, C // g)
    mu = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    h = ((xf - mu) * jax.lax.rsqrt(var + eps)).reshape(B, H, W, C)
    h = h * gn_scale + gn_bias
    h = h * jax.nn.sigmoid(h)
    out = jax.lax.conv_general_dilated(
        h.astype(x.dtype), w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return (out + b).astype(x.dtype)


def _bench() -> None:  # pragma: no cover - requires TPU wall clock
    import time

    B, H, W, C = 128, 8, 32, 320
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
    gs = jnp.ones((C,), jnp.float32)
    gb = jnp.zeros((C,), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, C, C),
                          jnp.bfloat16) * 0.02
    b = jnp.zeros((C,), jnp.float32)

    ref = jax.jit(xla_reference)
    fused = fused_gn_silu_conv3x3

    a = np.asarray(ref(x, gs, gb, w, b), np.float32)
    c = np.asarray(fused(x, gs, gb, w, b), np.float32)
    print("max|diff|:", np.abs(a - c).max())

    # chain 200 applications inside one jit so per-call tunnel latency
    # amortises, and return only a SCALAR: shipping the [128,8,32,320]
    # bf16 output (21 MB) through the axon tunnel costs tens of ms and
    # would dominate the per-op time being measured
    def chain(fn):
        @jax.jit
        def run(x):
            def body(h, _):
                return fn(h, gs, gb, w, b), None
            h, _ = jax.lax.scan(body, x, None, length=200)
            return jnp.mean(h.astype(jnp.float32))
        return run

    for name, fn in [("xla", ref), ("pallas", fused)]:
        r = chain(fn)
        np.asarray(r(x))  # compile+warm
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(r(x))
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best / 200 * 1e3:.3f} ms per GN+SiLU+conv (B={B})")


if __name__ == "__main__":  # pragma: no cover
    _bench()
