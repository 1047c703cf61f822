import dataclasses
import os

import jax
import numpy as np
import pytest

from worddiffusion_tpu.configs.config import (
    DataConfig,
    DiffusionConfig,
    Experiment,
    MeshConfig,
    TrainConfig,
    UNetConfig,
)
from worddiffusion_tpu.data.dataset import LatentLookup, WordImageDataset
from worddiffusion_tpu.data.gt import WriterRegistry
from worddiffusion_tpu.data.synthetic import synthetic_corpus
from worddiffusion_tpu.data.tokenizer import Tokenizer
from worddiffusion_tpu.train.checkpoint import CheckpointManager
from worddiffusion_tpu.train.loop import Trainer
from worddiffusion_tpu.train.state import TrainState, make_optimizer
from worddiffusion_tpu.utils.stop_flag import StopFlag


def tiny_exp(tmp_path, **train_kw):
    return Experiment(
        name="tiny",
        unet=UNetConfig(
            model_channels=32, context_dim=32, num_heads=4, vocab_size=54,
            num_writers=8, max_seq_len=10, dtype="float32",
        ),
        data=DataConfig(max_chars=10, batch_size=8),
        diffusion=DiffusionConfig(num_steps=40),
        train=TrainConfig(
            save_path=str(tmp_path), ckpt_every_epochs=1,
            ema_warmup_steps=2, epochs=2, **train_kw,
        ),
        mesh=MeshConfig(data=8, model=1),
    )


def make_dataset(n_latents=32):
    samples = synthetic_corpus(samples_per_word=4)[:n_latents]
    reg = WriterRegistry()
    for s in samples:
        reg.add(s.writer)
    tok = Tokenizer.from_name("eng_main", 10)
    # precomputed latents -> no VAE needed in the loop
    rng = np.random.default_rng(0)
    cache = LatentLookup(
        {s.image: rng.normal(size=(8, 32, 4)).astype(np.float32) for s in samples}
    )
    return WordImageDataset(samples, reg, tok, DataConfig(max_chars=10), latent_cache=cache)


def test_stop_flag(tmp_path):
    path = str(tmp_path / "stop.txt")
    flag = StopFlag(path, poll_interval_s=0.0)
    assert not flag.should_stop()     # missing file -> keep running
    flag.arm()
    assert not flag.should_stop()
    with open(path, "w") as f:
        f.write("0")
    assert flag.should_stop()
    assert flag.should_stop()         # sticky


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    tx = make_optimizer(1e-4)
    params = {"w": jnp.arange(4.0), "b": jnp.zeros((2,))}
    state = TrainState.create(params, tx)
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(7, state, {"loss": 0.5})
    assert mgr.latest_step() == 7
    blank = TrainState.create({"w": jnp.zeros(4), "b": jnp.zeros(2)}, tx)
    restored = mgr.restore(blank)
    assert int(restored.step) == 7
    assert np.allclose(np.asarray(restored.params["w"]), np.arange(4.0))
    mgr.close()


def test_trainer_two_epochs_and_resume(tmp_path):
    exp = tiny_exp(tmp_path)
    ds = make_dataset()
    trainer = Trainer(exp, ds)
    state = trainer.run(epochs=2)
    steps_after = int(state.step)
    assert steps_after == 2 * (len(ds) // exp.data.batch_size)
    assert trainer.ckpt.latest_step() == steps_after

    # resume continues from the checkpoint toward the TOTAL epoch target
    trainer2 = Trainer(exp, ds)
    state2 = trainer2.run(epochs=3, resume=True)
    assert int(state2.step) == 3 * (len(ds) // exp.data.batch_size)


def _tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    return len(la) == len(lb) and all(
        np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(la, lb)
    )


def test_resume_is_bit_deterministic(tmp_path):
    """The Trainer RNG & resume contract (loop.py): kill a run
    mid-epoch (max_steps), resume from the orbax checkpoint, and the
    final params/EMA/opt-state are BITWISE identical to an
    uninterrupted run — pinning per-step RNG fold-in, the EMA warmup
    counter, and data order across the resume boundary."""
    ds = make_dataset()
    spe = len(ds) // 8  # steps/epoch at batch 8
    assert spe >= 2  # the kill point below must land mid-epoch

    exp_a = tiny_exp(tmp_path / "a")
    full = Trainer(exp_a, ds).run(epochs=2)

    exp_b = tiny_exp(tmp_path / "b")
    kill_at = spe + 1  # one batch into epoch 1
    part = Trainer(exp_b, ds).run(epochs=2, max_steps=kill_at)
    assert int(part.step) == kill_at
    resumed = Trainer(exp_b, ds).run(epochs=2, resume=True)

    assert int(resumed.step) == int(full.step)
    assert _tree_equal(resumed.params, full.params)
    assert _tree_equal(resumed.ema_params, full.ema_params)
    assert _tree_equal(resumed.opt_state, full.opt_state)


def test_trainer_stop_flag(tmp_path):
    flag_path = str(tmp_path / "flags" / "stop.txt")
    os.makedirs(os.path.dirname(flag_path), exist_ok=True)
    with open(flag_path, "w") as f:
        f.write("0")
    exp = tiny_exp(tmp_path, stop_flag_file=flag_path)
    ds = make_dataset()
    trainer = Trainer(exp, ds)
    trainer.stop.poll_interval_s = 0.0
    state = trainer.run(epochs=5)
    assert int(state.step) == 0  # stopped before the first step


def test_trainer_writes_metrics_jsonl(tmp_path):
    import json

    exp = tiny_exp(tmp_path, log_every=1)
    ds = make_dataset()
    trainer = Trainer(exp, ds)
    trainer.run(epochs=1)
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines, "no metrics logged"
    assert "loss" in lines[0] and "mse" in lines[0]
    assert lines[-1]["step"] == len(ds) // exp.data.batch_size


def test_metrics_log_images(tmp_path):
    """log_images records the grid shape in JSONL (wandb mirror is
    optional); the Trainer calls it with the preview_fn's return."""
    import json

    from worddiffusion_tpu.utils.metrics import MetricsLogger

    m = MetricsLogger(str(tmp_path / "m.jsonl"))
    m.log_images(7, "preview", np.zeros((3, 16, 32, 3), np.float32))
    m.close()
    rec = json.loads(open(tmp_path / "m.jsonl").readline())
    assert rec["step"] == 7 and rec["preview_shape"] == [3, 16, 32, 3]
