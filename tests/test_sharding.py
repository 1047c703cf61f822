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
