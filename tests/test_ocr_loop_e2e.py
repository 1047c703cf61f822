"""OCR-in-the-loop end to end: a *trained* CTC recognizer drives the
regeneration accept/reject filter (``regenerateFromtrain2.py:896-967``).

The diffusion-side counterpart (train a real model, regenerate with the
trained filter on the chip) is the committed artifact in
docs/OCR_LOOP.md; this test proves the filter mechanics with a genuine
trained recognizer on CPU: a tiny-width CTCRecognizer is trained on
synthetic renders to read words back, then the Regenerator must accept
correctly-rendered images at a rate far above the untrained-filter
baseline (which rejects ~everything).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from worddiffusion_tpu.data.alphabets import OCR_ENG, OCR_ENG_BLANK
from worddiffusion_tpu.data.gt import Sample
from worddiffusion_tpu.data.synthetic import render_word
from worddiffusion_tpu.generate.regenerate import Regenerator
from worddiffusion_tpu.models.ocr import CTCRecognizer
from worddiffusion_tpu.ops.ctc import (
    collapse_and_decode,
    ctc_loss,
    encode_ocr_labels,
    greedy_frame_ids,
)

WORDS = ["the", "and", "word"]
H, W = 64, 128  # the recognizer's pooling stack expects 64-px height


def _render(word, seed):
    img = render_word(word, H, W, seed=seed)[..., :1]
    return (img.astype(np.float32) / 255.0 - 0.5) / 0.5  # [-1, 1]


def _train_recognizer(steps=220):
    model = CTCRecognizer(
        num_classes=len(OCR_ENG), widths=(8, 16, 16, 16, 32),
        dtype=jnp.float32,
    )
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, np.zeros((1, H, W, 1), np.float32))
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, imgs, labels, lens, drng):
        def loss_fn(p):
            logits = model.apply(p, imgs, deterministic=False, rngs={"dropout": drng})
            return jnp.mean(ctc_loss(logits, labels, lens, blank_id=OCR_ENG_BLANK))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    np_rng = np.random.default_rng(0)
    batch = 8
    loss = None
    for it in range(steps):
        ws = [WORDS[i % len(WORDS)] for i in range(batch)]
        imgs = np.stack([_render(w, int(np_rng.integers(0, 500))) for w in ws])
        labels, lens = encode_ocr_labels(ws, OCR_ENG, 10)
        params, opt, loss = step(
            params, opt, jnp.asarray(imgs), jnp.asarray(labels),
            jnp.asarray(lens), jax.random.fold_in(rng, it),
        )
    return model, params, float(loss)


class RenderSampler:
    """Sampler stub: 'generates' ground-truth renders of the requested
    words, so filter quality is isolated from diffusion quality."""

    class _E:
        class unet:
            use_phosc = False

    exp = _E()

    def sample_async(self, words, writer_ids, rng, phosc=None):
        imgs = np.stack([
            render_word(w, H, W, seed=9_000 + i) for i, w in enumerate(words)
        ]).astype(np.float32) / 255.0  # [0,1] float, like latent-mode output
        return jnp.asarray(imgs)


@pytest.mark.slow
def test_trained_filter_accepts_untrained_rejects(tmp_path):
    model, params, loss = _train_recognizer()

    # the recognizer genuinely reads: held-out renders decode exactly
    probe = np.stack([_render(w, 7_777 + i) for i, w in enumerate(WORDS)])
    decoded = collapse_and_decode(
        np.asarray(greedy_frame_ids(model.apply(params, jnp.asarray(probe)))),
        OCR_ENG,
    )
    heldout = np.mean([d == w for d, w in zip(decoded, WORDS)])
    assert heldout >= 2 / 3, f"recognizer failed to train: {decoded} (loss {loss})"

    corpus = [Sample(f"img-{i:03d}.png", "0", WORDS[i % len(WORDS)])
              for i in range(8)]

    trained = Regenerator(
        RenderSampler(),
        ocr_apply=jax.jit(lambda im: model.apply(params, im)),
        out_dir=str(tmp_path / "trained"),
    )
    stats_trained = trained.run(corpus, batch_size=4, rng=jax.random.PRNGKey(0))

    untrained_params = model.init(
        jax.random.PRNGKey(123), np.zeros((1, H, W, 1), np.float32)
    )
    untrained = Regenerator(
        RenderSampler(),
        ocr_apply=jax.jit(lambda im: model.apply(untrained_params, im)),
        out_dir=str(tmp_path / "untrained"),
    )
    stats_untrained = untrained.run(corpus, batch_size=4, rng=jax.random.PRNGKey(0))

    # trained filter accepts real word images; untrained baseline ~0
    assert stats_trained.accept_rate >= 0.5
    assert stats_trained.accept_rate > stats_untrained.accept_rate
