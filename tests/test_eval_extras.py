import jax
import jax.numpy as jnp
import numpy as np

from worddiffusion_tpu.configs.config import UNetConfig
from worddiffusion_tpu.eval.fid import (
    compute_features,
    fid_score,
    frechet_distance,
    gaussian_stats,
)
from worddiffusion_tpu.models.higan import HiGanGenerator
from worddiffusion_tpu.utils.metrics import MetricsLogger, StepTimer


def test_fid_zero_for_identical():
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(500, 16))
    assert fid_score(feats, feats.copy()) < 1e-6


def test_fid_grows_with_shift():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(500, 16))
    b = a + 1.0
    c = a + 3.0
    assert fid_score(a, b) < fid_score(a, c)
    # mean shift of d in every dim -> FID ~= 16*d^2
    assert abs(fid_score(a, b) - 16.0) < 1.5


def test_fid_svd_path_matches_sqrtm():
    """fid_score's [n2, n1]-SVD trace identity is EXACT vs the classic
    sqrtm-of-covariance-product formula, in both regimes (n > d and
    n < d, where the covariances are rank-deficient)."""
    rng = np.random.default_rng(1)
    for n1, n2, d in [(60, 40, 8), (12, 9, 50)]:
        a = rng.normal(size=(n1, d)) @ rng.normal(size=(d, d)) * 0.3
        b = rng.normal(size=(n2, d)) + 0.5
        classic = frechet_distance(*gaussian_stats(a), *gaussian_stats(b))
        assert abs(fid_score(a, b) - classic) < 1e-6 * max(1.0, classic)


def test_compute_features():
    feats = compute_features(lambda x: x.mean(axis=(1, 2)),
                             [np.ones((2, 4, 4, 3)), np.zeros((3, 4, 4, 3))])
    assert feats.shape == (5, 3)


def test_higan_generator_forward_and_grad():
    cfg = UNetConfig(model_channels=32, context_dim=32, vocab_size=54,
                     num_writers=8, max_seq_len=10, dtype="float32")
    model = HiGanGenerator(cfg, num_blocks=2)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 8, 32, 4))
    ids = jax.random.randint(rng, (2, 10), 0, 53)
    tlen = jnp.array([4, 7])
    t = jnp.array([5, 100])
    wid = jnp.array([0, 3])
    params = model.init(rng, x, ids, tlen, t, wid)
    out = model.apply(params, x, ids, tlen, t, wid)
    assert out.shape == x.shape
    # zero-init out conv -> identity-zero at init
    assert np.allclose(np.asarray(out), 0.0)

    g = jax.grad(lambda p: jnp.mean((model.apply(p, x, ids, tlen, t, wid) - 1) ** 2))(params)
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


def test_metrics_logger_and_timer(tmp_path):
    import json

    path = str(tmp_path / "metrics.jsonl")
    m = MetricsLogger(path)
    m.log(1, loss=0.5)
    m.log(2, loss=0.25, mse=0.2)
    m.close()
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["step"] == 1 and lines[1]["mse"] == 0.2

    timer = StepTimer()
    assert timer.tick() is None
    dt = timer.tick()
    assert dt is not None and timer.step_time_ema is not None


def test_gzsl_calibrated_stacking_recovers_unseen():
    """Uncalibrated GZSL collapses unseen accuracy when a seen word
    scores a hair higher; calibrated stacking recovers it without
    destroying seen accuracy (the sweep picks the sweet spot)."""
    from worddiffusion_tpu.data.alphabets import phos_dim
    from worddiffusion_tpu.data.phosc import lexicon_matrix
    from worddiffusion_tpu.eval.zsl import gzsl_accuracy, gzsl_calibrated_stacking

    seen, unseen = ["the", "of"], ["and"]
    words, lex = lexicon_matrix(seen + unseen, "eng")
    lex = lex / np.linalg.norm(lex, axis=1, keepdims=True)
    v = {w: lex[words.index(w)] for w in words}
    # unseen image: right vector present, but a seen word wins by a hair
    preds_seen = np.stack([v["the"], v["of"]]).astype(np.float32)
    preds_unseen = (v["and"] + 1.01 * v["the"])[None].astype(np.float32)

    D = phos_dim("eng")
    apply_fn = lambda im: {"phos": im[:, :D], "phoc": im[:, D:]}
    mk = lambda: ([(preds_seen, ["the", "of"])], [(preds_unseen, ["and"])])

    sb, ub = mk()
    gz = gzsl_accuracy(apply_fn, sb, ub, seen, unseen, "eng")
    assert gz["seen"] == 1.0 and gz["unseen"] == 0.0

    sb, ub = mk()
    cal = gzsl_calibrated_stacking(apply_fn, sb, ub, seen, unseen, "eng")
    assert cal["best"]["unseen"] == 1.0
    assert cal["best"]["harmonic_mean"] > 0.66
    # gamma=0 point of the curve reproduces the uncalibrated numbers
    g0 = cal["curve"][0]
    assert g0["gamma"] == 0.0 and g0["seen"] == 1.0 and g0["unseen"] == 0.0


def test_gzsl_accuracy_with_margin_fixed_gamma():
    """gzsl_accuracy_with_margin evaluates ONE externally chosen gamma
    under the union-lexicon argmax: gamma=0 reproduces the uncalibrated
    protocol; a margin big enough to beat the seen-bias recovers the
    unseen sample while the correct seen answers survive (their own
    score drops by the same gamma as every competitor's)."""
    from worddiffusion_tpu.data.alphabets import phos_dim
    from worddiffusion_tpu.data.phosc import lexicon_matrix
    from worddiffusion_tpu.eval.zsl import gzsl_accuracy_with_margin

    seen, unseen = ["the", "of"], ["and"]
    words, lex = lexicon_matrix(seen + unseen, "eng")
    lex = lex / np.linalg.norm(lex, axis=1, keepdims=True)
    v = {w: lex[words.index(w)] for w in words}
    preds_seen = np.stack([v["the"], v["of"]]).astype(np.float32)
    preds_unseen = (v["and"] + 1.01 * v["the"])[None].astype(np.float32)

    D = phos_dim("eng")
    apply_fn = lambda im: {"phos": im[:, :D], "phoc": im[:, D:]}
    mk = lambda: ([(preds_seen, ["the", "of"])], [(preds_unseen, ["and"])])

    sb, ub = mk()
    r0 = gzsl_accuracy_with_margin(apply_fn, sb, ub, seen, unseen, 0.0, "eng")
    assert r0["seen"] == 1.0 and r0["unseen"] == 0.0

    sb, ub = mk()
    r = gzsl_accuracy_with_margin(apply_fn, sb, ub, seen, unseen, 0.3, "eng")
    assert r["gamma"] == 0.3
    assert r["unseen"] == 1.0 and r["seen"] == 1.0
    assert r["harmonic_mean"] == 1.0
