import numpy as np

from worddiffusion_tpu.diffusion.schedule import NoiseSchedule


def test_linear_schedule_matches_torch_linspace():
    s = NoiseSchedule.linear(600)
    assert s.beta.shape == (600,)
    assert np.isclose(s.beta[0], 1e-4)
    assert np.isclose(s.beta[-1], 0.02)
    # inclusive endpoints, uniform spacing (torch.linspace semantics)
    diffs = np.diff(s.beta.astype(np.float64))
    assert np.allclose(diffs, diffs[0], rtol=1e-4)


def test_alpha_hat_cumprod():
    s = NoiseSchedule.linear(10)
    expected = np.cumprod(1.0 - np.linspace(1e-4, 0.02, 10))
    assert np.allclose(s.alpha_hat, expected, rtol=1e-6)


def test_q_sample_and_timesteps():
    import jax
    import jax.numpy as jnp

    from worddiffusion_tpu.diffusion.forward import q_sample, sample_timesteps

    s = NoiseSchedule.linear(600)
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (4, 8, 32, 4))
    noise = jax.random.normal(jax.random.fold_in(rng, 1), x0.shape)
    t = sample_timesteps(s, jax.random.fold_in(rng, 2), 4)
    assert t.shape == (4,)
    assert int(t.min()) >= 1 and int(t.max()) < 600

    xt = q_sample(s, x0, t, noise)
    assert xt.shape == x0.shape
    # at t -> manual formula
    manual = (
        jnp.sqrt(s.alpha_hat[np.asarray(t)])[:, None, None, None] * x0
        + jnp.sqrt(1 - s.alpha_hat[np.asarray(t)])[:, None, None, None] * noise
    )
    assert np.allclose(xt, manual, rtol=1e-5, atol=1e-5)


def test_t0_fully_preserves_signal():
    s = NoiseSchedule.linear(1000)
    assert s.sqrt_alpha_hat[0] > 0.99
    assert s.sqrt_one_minus_alpha_hat[-1] > 0.99
