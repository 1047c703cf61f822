"""Remaining path coverage: remat, profiler trace, phosc through the
Trainer, distributed helpers."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from worddiffusion_tpu.configs.config import (
    DataConfig,
    DiffusionConfig,
    Experiment,
    MeshConfig,
    TrainConfig,
    UNetConfig,
)


def test_remat_forward_and_grad_match():
    from worddiffusion_tpu.models.unet import UNet

    kw = dict(model_channels=32, context_dim=32, num_heads=4, vocab_size=54,
              num_writers=8, max_seq_len=10, dtype="float32")
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 8, 32, 4))
    t = jnp.array([3, 7])
    ctx = jax.random.randint(rng, (2, 10), 0, 53)
    wid = jnp.array([0, 1])

    plain = UNet(UNetConfig(**kw))
    remat = UNet(UNetConfig(remat=True, **kw))
    params = plain.init(rng, x, t, ctx, wid)
    o1 = plain.apply(params, x, t, ctx, wid)
    o2 = remat.apply(params, x, t, ctx, wid)  # same param tree
    assert np.allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)

    g1 = jax.grad(lambda p: jnp.sum(plain.apply(p, x, t, ctx, wid) ** 2))(params)
    g2 = jax.grad(lambda p: jnp.sum(remat.apply(p, x, t, ctx, wid) ** 2))(params)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), g1, g2
    )
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-4


def test_profiler_trace_writes(tmp_path):
    from worddiffusion_tpu.utils.metrics import trace

    with trace(str(tmp_path)):
        jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    # jax profiler writes a plugins/profile dir
    found = []
    for root, dirs, files in os.walk(tmp_path):
        found.extend(files)
    assert found, "no trace files written"


def test_trainer_with_phosc_batches(tmp_path):
    from worddiffusion_tpu.data.dataset import LatentLookup, WordImageDataset
    from worddiffusion_tpu.data.gt import WriterRegistry
    from worddiffusion_tpu.data.synthetic import synthetic_corpus
    from worddiffusion_tpu.data.tokenizer import Tokenizer
    from worddiffusion_tpu.train.loop import Trainer

    samples = synthetic_corpus(samples_per_word=4)[:16]
    reg = WriterRegistry()
    for s in samples:
        reg.add(s.writer)
    tok = Tokenizer.from_name("eng_main", 10)
    rng = np.random.default_rng(0)
    cache = LatentLookup(
        {s.image: rng.normal(size=(8, 32, 4)).astype(np.float32) for s in samples}
    )
    dcfg = DataConfig(max_chars=10, batch_size=8)
    ds = WordImageDataset(samples, reg, tok, dcfg, use_phosc=True,
                          latent_cache=cache)
    exp = Experiment(
        unet=UNetConfig(model_channels=32, context_dim=32, num_heads=4,
                        vocab_size=54, num_writers=8, max_seq_len=10,
                        use_phosc=True, phosc_dim=769, attn1_cross=False,
                        dtype="float32"),
        data=dcfg,
        diffusion=DiffusionConfig(num_steps=20),
        train=TrainConfig(save_path=str(tmp_path), ckpt_every_epochs=1,
                          ema_warmup_steps=2),
        mesh=MeshConfig(data=8),
    )
    state = Trainer(exp, ds).run(epochs=1)
    assert int(state.step) == 2


def test_local_batch_slice():
    from worddiffusion_tpu.parallel.distributed import local_batch_slice

    assert local_batch_slice(64) == 64  # single process


def test_wd_platform_env_pins_cpu():
    """WD_PLATFORM=cpu must pin the platform at the jax.config layer
    (JAX_PLATFORMS alone is overridden by deployment sitecustomize
    hooks that force-select an accelerator backend — a 'CPU' run
    landing on the shared chip silently contends with training)."""
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-c",
         "import worddiffusion_tpu, jax; "
         "print([d.platform for d in jax.devices()])"],
        env={"PATH": os.environ.get("PATH", ""),
             "PALLAS_AXON_POOL_IPS": os.environ.get("PALLAS_AXON_POOL_IPS", ""),
             "HOME": os.environ.get("HOME", "/root"),
             "WD_PLATFORM": "cpu", "WD_CPU_DEVICES": "2"},
        capture_output=True, text=True, timeout=120,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "['cpu', 'cpu']" in out.stdout, out.stdout
