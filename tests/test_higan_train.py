import jax
import jax.numpy as jnp
import numpy as np

from worddiffusion_tpu.configs.config import (
    DataConfig,
    Experiment,
    TrainConfig,
    UNetConfig,
)
from worddiffusion_tpu.diffusion.schedule import NoiseSchedule
from worddiffusion_tpu.models.higan import HiGanDenoiserAdapter
from worddiffusion_tpu.train.state import TrainState, make_optimizer
from worddiffusion_tpu.train.step import make_train_step


def test_higan_adapter_in_standard_train_step():
    cfg = UNetConfig(model_channels=32, context_dim=32, vocab_size=54,
                     num_writers=8, max_seq_len=10, dtype="float32")
    exp = Experiment(
        unet=cfg,
        data=DataConfig(max_chars=10),
        train=TrainConfig(lr=3e-4, ema_warmup_steps=2, cfg_drop_prob=0.0),
    )
    model = HiGanDenoiserAdapter(cfg, num_blocks=2)
    rng = jax.random.PRNGKey(0)
    b = {
        "latent": jnp.asarray(np.random.default_rng(0).normal(size=(4, 8, 32, 4)).astype(np.float32)),
        "context": jnp.asarray(np.random.default_rng(1).integers(0, 53, (4, 10)).astype(np.int32)),
        "writer": jnp.asarray(np.arange(4, dtype=np.int32)),
    }
    params = model.init(rng, b["latent"][:2], jnp.zeros((2,), jnp.int32),
                        b["context"][:2], b["writer"][:2])
    tx = make_optimizer(exp.train.lr)
    state = TrainState.create(params, tx)
    step = jax.jit(make_train_step(model, NoiseSchedule.linear(50), exp, tx))
    losses = []
    for _ in range(10):
        state, m = step(state, b, rng)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
