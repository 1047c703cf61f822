"""Tests for the auxiliary component families: style encoder, character
counter, masking sampler, prompt patch, analysis, dataset manipulation."""

import jax
import jax.numpy as jnp
import numpy as np

from worddiffusion_tpu.data.gt import Sample
from worddiffusion_tpu.data.manipulate import (
    balance_by_length,
    balance_by_word,
    trim_dataset,
)
from worddiffusion_tpu.diffusion.masking import masked_ddpm_sample, timestep_mask
from worddiffusion_tpu.diffusion.schedule import NoiseSchedule
from worddiffusion_tpu.models.charcounter import (
    CharacterCounterNet,
    counter_loss,
    length_onehot,
)
from worddiffusion_tpu.models.phoscnet import FixedPatchPrompter, spatial_pyramid_pool
from worddiffusion_tpu.models.style import StyleEncoder, build_style_dict, triplet_loss
from worddiffusion_tpu.utils.analysis import embedding_correlation, word_length_histogram


def test_style_encoder_shapes():
    enc = StyleEncoder(dtype="float32")
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 64, 256, 3))
    params = enc.init(rng, x)
    feat = enc.apply(params, x)
    assert feat.shape == (2, 2048)
    enc2 = StyleEncoder(out_dim=4096, dtype="float32")
    params2 = enc2.init(rng, x)
    assert enc2.apply(params2, x).shape == (2, 4096)


def test_triplet_loss_and_style_dict():
    a = jnp.zeros((2, 8))
    p = jnp.zeros((2, 8))
    n = jnp.ones((2, 8))
    assert float(triplet_loss(a, p, n)) == 0.0
    assert float(triplet_loss(a, n, p)) > 0.0

    enc = StyleEncoder(dtype="float32")
    rng = jax.random.PRNGKey(0)
    imgs = np.random.default_rng(0).normal(size=(3, 64, 64, 3)).astype(np.float32)
    params = enc.init(rng, imgs)
    d = build_style_dict(enc, params, {"w1": imgs, "w2": imgs[:1]})
    assert set(d) == {"w1", "w2"} and d["w1"].shape == (2048,)


def test_character_counter():
    net = CharacterCounterNet(dtype="float32")
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 50, 250, 3))
    params = net.init(rng, x)
    probs = net.apply(params, x)
    assert probs.shape == (2, 17)
    assert np.allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)
    oh = length_onehot(["abc", "a" * 30])
    assert oh.shape == (2, 17)
    assert int(jnp.argmax(oh[0])) == 2 and int(jnp.argmax(oh[1])) == 16
    assert np.isfinite(float(counter_loss(probs, oh)))


def test_spatial_pyramid_pool():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 7, 9, 4))
    out = spatial_pyramid_pool(x, (1, 2))
    assert out.shape == (2, 4 * (1 + 4))
    assert np.allclose(np.asarray(out[:, :4]), np.asarray(x.max(axis=(1, 2))))


def test_fixed_patch_prompter():
    prm = FixedPatchPrompter(height=8, width=16)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 8, 16, 3))
    params = prm.init(rng, x)
    out = prm.apply(params, x)
    assert out.shape == x.shape
    assert not np.allclose(np.asarray(out), 0.0)


def test_timestep_mask_monotone():
    rng = jax.random.PRNGKey(0)
    ref = jax.random.uniform(rng, (1, 8, 32, 4))
    hi = timestep_mask(ref, jnp.asarray(580), 600)
    lo = timestep_mask(ref, jnp.asarray(10), 600)
    # high t -> most pixels fixed; low t -> most free
    assert float(hi.mean()) > float(lo.mean())


def test_masked_sampler_pins_reference():
    sched = NoiseSchedule.linear(20)
    rng = jax.random.PRNGKey(0)
    ref = jnp.ones((1, 4, 8, 2))  # mean 1 > any threshold -> fully masked
    eps_fn = lambda x, t: jnp.zeros_like(x)
    out, snaps = masked_ddpm_sample(sched, eps_fn, rng, ref)
    assert out.shape == ref.shape
    # fully-masked sampling tracks q_sample(ref, 0) ~= ref
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=0.3)
    _, snaps = masked_ddpm_sample(sched, eps_fn, rng, ref, snapshot_every=5)
    assert snaps.shape[0] == (20 - 1 + 4) // 5


def test_analysis_utils():
    keys, corr = embedding_correlation(
        {"a": np.random.rand(3, 8), "b": np.random.rand(8)}
    )
    assert keys == ["a", "b"]
    assert corr.shape == (2, 2)
    assert np.allclose(np.diag(corr), 1.0)
    hist = word_length_histogram(["a", "ab", "ab", "abc"])
    assert hist == {1: 1, 2: 2, 3: 1}


def test_dataset_manipulation():
    samples = [Sample(f"i{k}.png", "w", w)
               for k, w in enumerate(["a"] * 5 + ["bb"] * 2 + ["ccc"] * 8)]
    bal = balance_by_word(samples, 4)
    from collections import Counter

    counts = Counter(s.word for s in bal)
    assert all(v == 4 for v in counts.values())
    ball = balance_by_length(samples, 3)
    assert len(ball) == 9
    trimmed = trim_dataset(samples, min_len=2)
    assert all(len(s.word) >= 2 for s in trimmed)
    trimmed2 = trim_dataset(samples, alphabet="abc")
    assert len(trimmed2) == len(samples)
    assert trim_dataset([Sample("x.png", "w", "ä")], alphabet="abc") == []
