"""End-to-end data paths for the three conditioning modes.

Round-1 gap (VERDICT #4): ``style_vec`` / ``char_images`` /
``cond_latents`` were accepted by the model but nothing produced those
batch keys. These tests drive dataset -> loader -> jitted train step for
each mode with REAL batch keys, and check the trainer fails loudly when
a configured conditioning is missing from the batch.

Reference data paths: style ``trainModifyCondition.py:466-468``, char
images ``:406-446``, img-conditioning ``:733`` (original_images=latents).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from worddiffusion_tpu.configs.config import (
    DataConfig,
    Experiment,
    TrainConfig,
    UNetConfig,
)
from worddiffusion_tpu.data.dataset import LatentLookup, WordImageDataset
from worddiffusion_tpu.data.gt import Sample, WriterRegistry
from worddiffusion_tpu.data.loader import batches
from worddiffusion_tpu.data.tokenizer import Tokenizer
from worddiffusion_tpu.diffusion.schedule import NoiseSchedule
from worddiffusion_tpu.models.unet import UNet
from worddiffusion_tpu.train.state import TrainState, make_optimizer
from worddiffusion_tpu.train.step import make_train_step


def corpus(n=8):
    words = ["the", "of", "and", "hand"]
    samples = [Sample(f"img-{i:03d}.png", str(i % 2), words[i % 4])
               for i in range(n)]
    reg = WriterRegistry()
    for s in samples:
        reg.add(s.writer)
    return samples, reg


def data_cfg(**kw):
    base = dict(max_chars=10, img_height=16, img_width=32, latent=False)
    base.update(kw)
    return DataConfig(**base)


def tiny_exp(**unet_kw):
    unet = UNetConfig(
        model_channels=32, context_dim=32, num_heads=4, vocab_size=54,
        num_writers=8, max_seq_len=10, in_channels=3, out_channels=3,
        dtype="float32", **unet_kw,
    )
    return Experiment(
        name="tiny", unet=unet, data=data_cfg(),
        train=TrainConfig(ema_warmup_steps=2, cfg_drop_prob=0.0),
    )


def dataset_batch(exp, ds, b=4):
    batch = next(batches(ds, b, shuffle=False))
    keep = {}
    keep["latent"] = batch.get("latent", batch.get("image"))
    for k in ("context", "writer", "phosc", "style_vec", "char_images",
              "cond_latents"):
        if k in batch:
            keep[k] = batch[k]
    return {k: jnp.asarray(v) for k, v in keep.items()}


def run_step(exp, batch, init_kwargs):
    model = UNet(exp.unet)
    rng = jax.random.PRNGKey(0)
    params = model.init(
        rng, batch["latent"][:2], jnp.zeros((2,), jnp.int32),
        batch["context"][:2], batch["writer"][:2], **init_kwargs,
    )
    tx = make_optimizer(exp.train.lr)
    state = TrainState.create(params, tx)
    sched = NoiseSchedule.linear(20)
    step = jax.jit(make_train_step(model, sched, exp, tx))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    return params, new_state, metrics


def test_style_vec_mode_trains_through_style_proj():
    samples, reg = corpus()
    tok = Tokenizer.from_name("eng_main", 10)
    style_lookup = {s.writer: np.full((64,), float(int(s.writer) + 1), np.float32)
                    for s in samples}
    ds = WordImageDataset(samples, reg, tok, data_cfg(),
                          style_lookup=style_lookup)
    rec = ds[0]
    assert rec["style_vec"].shape == (64,)
    exp = tiny_exp(style_vec_dim=64)
    batch = dataset_batch(exp, ds)
    assert batch["style_vec"].shape == (4, 64)
    params, new_state, metrics = run_step(
        exp, batch, {"style_vec": batch["style_vec"][:2]}
    )
    assert np.isfinite(float(metrics["loss"]))
    # the style projection actually received gradient
    old = params["params"]["style_proj"]["wrd_proj"]["Dense_0"]["kernel"]
    new = new_state.params["params"]["style_proj"]["wrd_proj"]["Dense_0"]["kernel"]
    assert not np.array_equal(np.asarray(old), np.asarray(new))


def test_style_vec_missing_writer_fails_loudly():
    samples, reg = corpus()
    tok = Tokenizer.from_name("eng_main", 10)
    ds = WordImageDataset(samples, reg, tok, data_cfg(),
                          style_lookup={"0": np.zeros((8,), np.float32)})
    with pytest.raises(KeyError, match="style_lookup has no vector"):
        ds[1]  # writer '1' absent from the style dict


def test_char_images_mode_trains_through_glyph_conv():
    samples, reg = corpus()
    tok = Tokenizer.from_name("eng_main", 10)
    ds = WordImageDataset(samples, reg, tok, data_cfg(),
                          char_images=True, char_image_size=(8, 8))
    rec = ds[0]
    assert rec["char_images"].shape == (10, 8, 8, 1)
    # glyph slots for real chars differ from the white padding
    assert rec["char_images"][0].min() < 0.5
    assert np.allclose(rec["char_images"][9], 1.0)
    exp = tiny_exp(use_char_images=True, char_image_size=(8, 8))
    batch = dataset_batch(exp, ds)
    params, new_state, metrics = run_step(
        exp, batch, {"char_images": batch["char_images"][:2]}
    )
    assert np.isfinite(float(metrics["loss"]))
    old = params["params"]["glyph_conv1"]["Conv_0"]["kernel"]
    new = new_state.params["params"]["glyph_conv1"]["Conv_0"]["kernel"]
    assert not np.array_equal(np.asarray(old), np.asarray(new))


def test_cond_latents_mode_concats_at_conv_in():
    samples, reg = corpus()
    tok = Tokenizer.from_name("eng_main", 10)
    lat = np.random.default_rng(0).normal(
        size=(len(samples), 16, 32, 3)).astype(np.float32)
    cache = LatentLookup.build([s.image for s in samples], lat)
    ds = WordImageDataset(samples, reg, tok, data_cfg(),
                          latent_cache=cache, cond_latents=True)
    rec = ds[0]
    assert np.array_equal(rec["cond_latents"], rec["latent"])
    exp = tiny_exp(img_conditioned=True)
    batch = dataset_batch(exp, ds)
    params, new_state, metrics = run_step(
        exp, batch, {"cond_latents": batch["cond_latents"][:2]}
    )
    assert np.isfinite(float(metrics["loss"]))
    # conv_in sees 2x channels
    k = params["params"]["conv_in"]["Conv_0"]["kernel"]
    assert np.asarray(k).shape[2] == 6


def test_missing_configured_conditioning_fails_loudly():
    """--wrdChrWrStyl with no style data must NOT train silently
    (the reference does, ``unet.py:1628``)."""
    exp = tiny_exp(style_vec_dim=64)
    samples, reg = corpus()
    tok = Tokenizer.from_name("eng_main", 10)
    ds = WordImageDataset(samples, reg, tok, data_cfg())  # no style_lookup
    batch = dataset_batch(exp, ds)
    with pytest.raises(ValueError, match="conditioning batch keys"):
        run_step(exp, batch, {"style_vec": jnp.zeros((2, 64), jnp.float32)})


def test_trainer_derives_cond_latents(tmp_path):
    """Trainer._device_batch falls back to the clean latent when the
    dataset does not emit cond_latents."""
    from worddiffusion_tpu.configs.config import MeshConfig
    from worddiffusion_tpu.train.loop import Trainer

    samples, reg = corpus()
    tok = Tokenizer.from_name("eng_main", 10)
    ds = WordImageDataset(samples, reg, tok, data_cfg())
    exp = tiny_exp(img_conditioned=True).replace(
        data=data_cfg(batch_size=4),
        mesh=MeshConfig(data=1, model=1),
    )
    import dataclasses

    exp = exp.replace(train=dataclasses.replace(
        exp.train, save_path=str(tmp_path), epochs=1, ckpt_every_epochs=1))
    trainer = Trainer(exp, ds)
    state = trainer.run(epochs=1)
    assert int(state.step) == 2  # 8 samples / batch 4
