import jax
import jax.numpy as jnp
import numpy as np

from worddiffusion_tpu.data.alphabets import OCR_ENG, OCR_ENG_BLANK
from worddiffusion_tpu.models.ocr import CTCRecognizer
from worddiffusion_tpu.ops.ctc import (
    collapse_and_decode,
    ctc_loss,
    encode_ocr_labels,
    greedy_frame_ids,
)


def test_collapse_and_decode_reference_semantics():
    # alphabet ' _ABC...' with blank '_' at 1
    a_idx = OCR_ENG.index("a")
    b_idx = OCR_ENG.index("b")
    frames = np.array([[a_idx, a_idx, OCR_ENG_BLANK, b_idx, b_idx]])
    assert collapse_and_decode(frames, OCR_ENG) == ["ab"]
    # repeated char WITHOUT blank collapses (reference quirk)
    frames = np.array([[a_idx, a_idx, a_idx, b_idx]])
    assert collapse_and_decode(frames, OCR_ENG) == ["ab"]
    # 'aa' needs an intervening blank
    frames = np.array([[a_idx, OCR_ENG_BLANK, a_idx]])
    assert collapse_and_decode(frames, OCR_ENG) == ["aa"]
    # leading/trailing spaces stripped
    sp = OCR_ENG.index(" ")
    frames = np.array([[sp, a_idx, sp]])
    assert collapse_and_decode(frames, OCR_ENG) == ["a"]


def test_encode_ocr_labels():
    ids, lens = encode_ocr_labels(["ab", "a"], OCR_ENG, 4)
    assert ids.shape == (2, 4)
    assert lens.tolist() == [2, 1]
    assert OCR_ENG[ids[0, 0]] == "a" and OCR_ENG[ids[0, 1]] == "b"


def test_recognizer_shapes_and_decode_pipeline():
    model = CTCRecognizer(num_classes=len(OCR_ENG), dtype="float32")
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 64, 256, 1))
    params = model.init(rng, x)
    logits = model.apply(params, x)
    assert logits.shape == (2, 64, len(OCR_ENG))
    frames = greedy_frame_ids(logits)
    words = collapse_and_decode(np.asarray(frames), OCR_ENG)
    assert len(words) == 2


def test_ctc_loss_trains_toy_recognizer():
    # overfit 1 synthetic "image" to the word 'ab': loss must drop a lot
    import optax

    model = CTCRecognizer(num_classes=len(OCR_ENG), dtype="float32")
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 64, 64, 1))
    params = model.init(rng, x)
    labels, lens = encode_ocr_labels(["ab"], OCR_ENG, 8)
    labels, lens = jnp.asarray(labels), jnp.asarray(lens)
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            logits = model.apply(p, x)
            return jnp.mean(ctc_loss(logits, labels, lens, blank_id=OCR_ENG_BLANK))

        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    first = None
    for i in range(60):
        params, opt, loss = step(params, opt)
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.2, (first, float(loss))
    # and the greedy decode now reads 'ab'
    frames = greedy_frame_ids(model.apply(params, x))
    assert collapse_and_decode(np.asarray(frames), OCR_ENG) == ["ab"]
