import jax
import jax.numpy as jnp
import numpy as np

from worddiffusion_tpu.configs.config import (
    DataConfig,
    Experiment,
    MeshConfig,
    TrainConfig,
    UNetConfig,
)
from worddiffusion_tpu.diffusion.schedule import NoiseSchedule
from worddiffusion_tpu.models.unet import UNet
from worddiffusion_tpu.parallel.mesh import make_mesh, shard_batch
from worddiffusion_tpu.train.state import TrainState, ema_update, make_optimizer
from worddiffusion_tpu.train.step import jit_train_step, make_train_step


def tiny_exp(**unet_kw):
    unet = UNetConfig(
        model_channels=32, context_dim=32, num_heads=4, vocab_size=54,
        num_writers=8, max_seq_len=10, dtype="float32", **unet_kw,
    )
    return Experiment(
        name="tiny",
        unet=unet,
        data=DataConfig(max_chars=10),
        train=TrainConfig(ema_warmup_steps=2, cfg_drop_prob=0.1),
    )


def make_batch(b=8, L=10):
    rng = np.random.default_rng(0)
    return {
        "latent": rng.normal(size=(b, 8, 32, 4)).astype(np.float32),
        "context": rng.integers(0, 53, size=(b, L)).astype(np.int32),
        "writer": rng.integers(0, 8, size=(b,)).astype(np.int32),
    }


def _init_state(exp):
    model = UNet(exp.unet)
    rng = jax.random.PRNGKey(0)
    b = make_batch(2)
    params = model.init(
        rng,
        jnp.asarray(b["latent"][:2]),
        jnp.zeros((2,), jnp.int32),
        jnp.asarray(b["context"][:2]),
        jnp.asarray(b["writer"][:2]),
    )
    tx = make_optimizer(exp.train.lr)
    return model, tx, TrainState.create(params, tx)


def test_train_step_decreases_loss():
    exp = tiny_exp()
    exp = exp.replace(
        train=TrainConfig(lr=3e-4, ema_warmup_steps=2, cfg_drop_prob=0.1)
    )
    model, tx, state = _init_state(exp)
    sched = NoiseSchedule.linear(50)
    step = jax.jit(make_train_step(model, sched, exp, tx))
    batch = {k: jnp.asarray(v) for k, v in make_batch(8).items()}
    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(30):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # per-step t/noise are resampled, so compare window averages
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    assert int(state.step) == 30


def test_ema_warmup_then_decay():
    params = {"w": jnp.ones((2,))}
    # during warmup ema == params
    e = ema_update({"w": jnp.zeros((2,))}, params, jnp.asarray(0), 0.9, 5)
    assert np.allclose(e["w"], 1.0)
    # after warmup: ema*b + p*(1-b)
    e = ema_update({"w": jnp.zeros((2,))}, params, jnp.asarray(10), 0.9, 5)
    assert np.allclose(e["w"], 0.1)


def test_train_step_sharded_on_mesh():
    exp = tiny_exp()
    model, tx, state = _init_state(exp)
    sched = NoiseSchedule.linear(50)
    mesh = make_mesh(MeshConfig(data=8, model=1))
    step = jit_train_step(make_train_step(model, sched, exp, tx), mesh, state)
    batch = shard_batch(make_batch(16), mesh)
    state = jax.device_put(
        state, jax.tree_util.tree_map(
            lambda _: jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
            state,
        ),
    )
    rng = jax.random.PRNGKey(0)
    state, metrics = step(state, batch, rng)
    assert np.isfinite(float(metrics["loss"]))
    state, metrics2 = step(state, batch, rng)
    assert float(metrics2["loss"]) != float(metrics["loss"])


def test_train_step_tp_mesh():
    # tensor-parallel axis: params sharded over 'model', still converges
    exp = tiny_exp()
    model, tx, state = _init_state(exp)
    sched = NoiseSchedule.linear(50)
    mesh = make_mesh(MeshConfig(data=4, model=2))
    step = jit_train_step(make_train_step(model, sched, exp, tx), mesh, state)
    from worddiffusion_tpu.parallel.mesh import param_sharding, replicated

    state = state.replace(
        params=jax.device_put(state.params, param_sharding(state.params, mesh)),
        ema_params=jax.device_put(
            state.ema_params, param_sharding(state.ema_params, mesh)
        ),
        opt_state=jax.device_put(
            state.opt_state,
            jax.tree_util.tree_map(lambda _: replicated(mesh), state.opt_state),
        ),
        step=jax.device_put(state.step, replicated(mesh)),
    )
    batch = shard_batch(make_batch(8), mesh)
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_ctc_aux_loss():
    exp = tiny_exp(ocr_head=True, ocr_classes=54, ocr_hidden=32, ocr_layers=1)
    exp = exp.replace(train=TrainConfig(ctc_weight=0.1, cfg_drop_prob=0.0))
    model, tx, state = _init_state(exp)
    sched = NoiseSchedule.linear(50)
    step = jax.jit(make_train_step(model, sched, exp, tx))
    batch = {k: jnp.asarray(v) for k, v in make_batch(4).items()}
    batch["ocr_ids"] = jnp.ones((4, 10), jnp.int32)
    batch["ocr_len"] = jnp.full((4,), 5, jnp.int32)
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert "ctc" in metrics and np.isfinite(float(metrics["ctc"]))
    assert float(metrics["loss"]) > float(metrics["mse"])


def test_train_step_tp_mesh_with_pallas_ffn():
    """The fused FF kernel's partitioning rule must compose with the
    full dp x tp train step (custom_vjp + custom_partitioning under a
    GSPMD jit with TP-sharded GEGLU weights)."""
    exp = tiny_exp(use_pallas_ffn=True)
    model, tx, state = _init_state(exp)
    sched = NoiseSchedule.linear(50)
    mesh = make_mesh(MeshConfig(data=4, model=2))
    step = jit_train_step(make_train_step(model, sched, exp, tx), mesh, state)
    from worddiffusion_tpu.parallel.mesh import param_sharding, replicated

    state = state.replace(
        params=jax.device_put(state.params, param_sharding(state.params, mesh)),
        ema_params=jax.device_put(
            state.ema_params, param_sharding(state.ema_params, mesh)
        ),
        opt_state=jax.device_put(
            state.opt_state,
            jax.tree_util.tree_map(lambda _: replicated(mesh), state.opt_state),
        ),
        step=jax.device_put(state.step, replicated(mesh)),
    )
    batch = shard_batch(make_batch(8), mesh)
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
