"""Multi-device tests on the virtual 8-CPU mesh (conftest sets
xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from worddiffusion_tpu.configs.config import MeshConfig
from worddiffusion_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_sharding,
    shard_batch,
)


def test_eight_devices_available():
    assert jax.device_count() >= 8


def test_make_mesh_dp():
    mesh = make_mesh(MeshConfig(data=-1, model=1))
    assert mesh.shape["data"] == jax.device_count()
    assert mesh.shape["model"] == 1


def test_make_mesh_dp_tp():
    mesh = make_mesh(MeshConfig(data=4, model=2))
    assert mesh.shape == {"data": 4, "model": 2}


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh(MeshConfig(data=8, model=1))
    batch = {"latent": np.zeros((16, 8, 32, 4), np.float32)}
    placed = shard_batch(batch, mesh)
    sh = placed["latent"].sharding
    assert sh.is_equivalent_to(batch_sharding(mesh), 4)


def test_sharded_computation_all_devices():
    mesh = make_mesh(MeshConfig(data=8, model=1))
    x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    xs = jax.device_put(x, batch_sharding(mesh))
    y = jax.jit(lambda a: (a * 2).sum())(xs)
    assert float(y) == x.sum() * 2


def test_param_sharding_tp_axes():
    mesh = make_mesh(MeshConfig(data=4, model=2))
    params = {
        "attn": {"to_q": {"kernel": jnp.zeros((32, 32))},
                 "to_out": {"kernel": jnp.zeros((32, 32))}},
        "conv": {"kernel": jnp.zeros((3, 3, 4, 8))},
    }
    sh = param_sharding(params, mesh)
    assert "model" in str(sh["attn"]["to_q"]["kernel"].spec)
    assert sh["conv"]["kernel"].spec == jax.sharding.PartitionSpec()


def test_pallas_ffn_partitions_without_gathers():
    """The fused FF kernel's SdyShardingRule must let a dp-sharded batch
    stay sharded: no all-gathers in the compiled program, sharded output
    and gradient. (A bare pallas_call would replicate every operand.)"""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from worddiffusion_tpu.ops.ffn_pallas import (
        _ln_ffn_reference,
        fused_ln_geglu_ffn,
    )

    mesh = make_mesh(MeshConfig(data=8, model=1))
    d, inner, m = 64, 128, 512
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (m, d))
    shapes = [(d,), (d,), (d, 2 * inner), (2 * inner,), (inner, d), (d,)]
    args = [
        0.05 * jax.random.normal(jax.random.fold_in(rng, i), s)
        for i, s in enumerate(shapes)
    ]
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None)))

    f = jax.jit(lambda x, *a: fused_ln_geglu_ffn(x, *a, block_m=64))
    hlo = f.lower(xs, *args).compile().as_text()
    assert hlo.count("all-gather") == 0
    out = f(xs, *args)
    assert out.sharding.spec == P("data")
    ref = _ln_ffn_reference(x, *args)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-3)

    g = jax.jit(
        jax.grad(lambda x, *a: jnp.sum(fused_ln_geglu_ffn(x, *a, block_m=64)))
    )(xs, *args)
    assert g.sharding.spec == P("data")


def test_pallas_ffn_kernel_backward_sharded_grads():
    """The fused BACKWARD kernel's partitioning: dx stays row-sharded
    with zero all-gathers, and the weight/bias/norm grads — row
    reductions the partition callback must psum itself (a Shardy rule
    cannot declare a reduction factor next to the passthrough dx) —
    match the unsharded reference exactly."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from worddiffusion_tpu.ops.ffn_pallas import (
        _ln_ffn_reference,
        fused_ln_geglu_ffn_kbwd,
    )

    mesh = make_mesh(MeshConfig(data=8, model=1))
    d, inner, m = 64, 128, 512
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (m, d))
    shapes = [(d,), (d,), (d, 2 * inner), (2 * inner,), (inner, d), (d,)]
    args = [
        0.05 * jax.random.normal(jax.random.fold_in(rng, i), s)
        for i, s in enumerate(shapes)
    ]
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None)))

    loss = lambda x, *a: jnp.sum(fused_ln_geglu_ffn_kbwd(x, *a, block_m=64) ** 2)
    gfun = jax.jit(jax.grad(loss, argnums=(0, 1, 3, 5)))
    hlo = gfun.lower(xs, *args).compile().as_text()
    assert hlo.count("all-gather") == 0
    g = gfun(xs, *args)
    assert g[0].sharding.spec == P("data")
    gr = jax.grad(
        lambda x, *a: jnp.sum(_ln_ffn_reference(x, *a) ** 2), argnums=(0, 1, 3, 5)
    )(x, *args)
    for a, b in zip(g, gr):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_pallas_fold_attn_partitions_without_gathers():
    """The fused fold-attention kernel's SdyShardingRule must let a
    dp-sharded batch stay sharded across x/wt/vw with no all-gathers,
    sharded output, and gradients that match the unsharded reference."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bench_kernels.attn_fold_pallas import (
        _fold_attn_reference,
        fused_fold_attention,
    )

    mesh = make_mesh(MeshConfig(data=8, model=1))
    b, n, c, heads, L = 8, 32, 64, 2, 6
    m = heads * L
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (b, n, c))
    gamma = 1 + 0.05 * jax.random.normal(jax.random.fold_in(rng, 1), (c,))
    beta = 0.05 * jax.random.normal(jax.random.fold_in(rng, 2), (c,))
    wt = 0.1 * jax.random.normal(jax.random.fold_in(rng, 3), (b, c, m))
    vw = 0.1 * jax.random.normal(jax.random.fold_in(rng, 4), (b, m, c))
    bo = 0.05 * jax.random.normal(jax.random.fold_in(rng, 5), (c,))

    ds = lambda a: jax.device_put(
        a, NamedSharding(mesh, P(*(("data",) + (None,) * (a.ndim - 1))))
    )
    xs, wts, vws = ds(x), ds(wt), ds(vw)

    f = jax.jit(
        lambda x, wt, vw: fused_fold_attention(x, gamma, beta, wt, vw, bo, heads)
    )
    hlo = f.lower(xs, wts, vws).compile().as_text()
    assert hlo.count("all-gather") == 0
    out = f(xs, wts, vws)
    assert out.sharding.spec[0] == "data"
    ref = _fold_attn_reference(x, gamma, beta, wt, vw, bo, heads)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4
    )

    g = jax.jit(
        jax.grad(
            lambda x, wt, vw: jnp.sum(
                fused_fold_attention(x, gamma, beta, wt, vw, bo, heads) ** 2
            )
        )
    )(xs, wts, vws)
    assert g.sharding.spec[0] == "data"


def test_pallas_fold_attention_partitions_without_gathers():
    """The RETIRED fold-attention kernel (bench_kernels/, measured
    +36% slower in-program — its header has the numbers): dp-sharded batch
    (x AND the per-sample folds) stays sharded with zero all-gathers;
    the LN/bias params replicate."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bench_kernels.attn_fold_sublayer_pallas import (
        build_folds,
        fold_attention_reference,
        fused_fold_attention,
    )

    mesh = make_mesh(MeshConfig(data=8, model=1))
    B, N, C, H, L = 8, 16, 64, 4, 10
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, N, C), jnp.bfloat16)
    ctx = jax.random.normal(jax.random.fold_in(rng, 1), (B, L, C), jnp.bfloat16)
    ws = [
        0.1 * jax.random.normal(jax.random.fold_in(rng, i), (C, C))
        for i in range(2, 6)
    ]
    gamma = jnp.ones((C,), jnp.float32)
    beta = jnp.zeros((C,), jnp.float32)
    bo = jnp.zeros((C,), jnp.float32)
    wt4, vw4 = build_folds(ctx, *ws, H, C // H, jnp.bfloat16)

    bsh = NamedSharding(mesh, P("data"))
    xs = jax.device_put(x, bsh)
    wts = jax.device_put(wt4, bsh)
    vws = jax.device_put(vw4, bsh)

    f = jax.jit(fused_fold_attention)
    hlo = f.lower(xs, wts, vws, gamma, beta, bo).compile().as_text()
    assert hlo.count("all-gather") == 0
    out = f(xs, wts, vws, gamma, beta, bo)
    assert out.sharding.spec == P("data")
    ref = fold_attention_reference(x, wt4, vw4, gamma, beta, bo)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2
    )
