"""Every dataset-family preset builds a consistent model + tokenizer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from worddiffusion_tpu.configs import presets
from worddiffusion_tpu.data.alphabets import phoc_dim, phos_dim
from worddiffusion_tpu.data.phosc import phosc_vector
from worddiffusion_tpu.data.tokenizer import Tokenizer
from worddiffusion_tpu.models.unet import UNet


@pytest.mark.parametrize("name", ["iam", "iam_base", "iam_phosc", "gw", "cvl", "norwegian"])
def test_preset_builds_and_shapes(name):
    exp = presets.get(name)
    tok = Tokenizer.from_name(exp.data.alphabet, exp.data.max_chars)
    assert tok.vocab_size == exp.unet.vocab_size
    assert exp.unet.max_seq_len == exp.data.max_chars

    model = UNet(exp.unet)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 8, 32, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, exp.data.max_chars), jnp.int32)
    wid = jnp.zeros((1,), jnp.int32)
    kw = {}
    if exp.unet.use_phosc:
        assert exp.unet.phosc_dim == phos_dim(exp.data.phos_version) + phoc_dim(
            exp.data.phos_version
        )
        kw["phosc_ids"] = jnp.zeros((1, exp.unet.phosc_dim), jnp.int32)
    shapes = jax.eval_shape(lambda: model.init(rng, x, t, ctx, wid, **kw))
    n = sum(int(np.prod(v.shape)) for v in jax.tree_util.tree_leaves(shapes))
    assert n > 1_000_000


@pytest.mark.parametrize("name,word", [
    ("iam", "hello"), ("gw", "orders"), ("norwegian", "fjerde"),
])
def test_preset_tokenizer_and_phosc_roundtrip(name, word):
    exp = presets.get(name)
    tok = Tokenizer.from_name(exp.data.alphabet, exp.data.max_chars)
    ids = tok.encode(word)
    assert ids.shape == (exp.data.max_chars,)
    v = phosc_vector(word, exp.data.phos_version)
    assert v.shape[0] == phos_dim(exp.data.phos_version) + phoc_dim(exp.data.phos_version)


def test_cvl_extended_alphabet_tokens():
    exp = presets.get("cvl")
    tok = Tokenizer.from_name(exp.data.alphabet, exp.data.max_chars)
    # CVL words are single tokens (no spaces; the reference's space->
    # underscore substitution would KeyError on this alphabet too)
    ids = tok.encode('word"42"!')
    assert (ids != 52).sum() >= 7  # punctuation/digits all encodable


def test_norwegian_special_chars():
    exp = presets.get("norwegian")
    tok = Tokenizer.from_name(exp.data.alphabet, exp.data.max_chars)
    ids = tok.encode("bøker")
    assert tok.decode(ids) == "bøker"
