import jax
import jax.numpy as jnp
import numpy as np

from worddiffusion_tpu.diffusion.sampler import (
    ddpm_sample,
    latent_to_image,
    pixel_to_uint8,
    regen_call_mask,
)
from worddiffusion_tpu.diffusion.schedule import NoiseSchedule


def test_regen_call_mask_matches_reference_condition():
    T = 600
    m = regen_call_mask(T, epoch=0)
    # epoch 0: i%5==0 or i%100==0 or i==T-1
    for i in [0, 5, 100, 595, 599]:
        assert m[i]
    for i in [1, 2, 3, 4, 598, 7]:
        assert not m[i]
    # ~121 calls out of 599 active steps
    assert 115 <= m[1:].sum() <= 125
    assert regen_call_mask(T, full_sampling=True).all()
    # epoch densification adds nothing beyond i%5 (all subsets)
    assert np.array_equal(regen_call_mask(T, epoch=11), m)


def test_ddpm_sample_perfect_model_recovers_signal():
    # If eps_fn returns the exact noise that q_sample would add, the
    # deterministic sampler walks back towards low-noise latents.
    sched = NoiseSchedule.linear(50)
    rng = jax.random.PRNGKey(0)
    x_init = jax.random.normal(rng, (2, 4, 8, 4))

    def eps_fn(x, t):
        return jnp.zeros_like(x)  # model says "no noise present"

    out = ddpm_sample(sched, eps_fn, rng, x_init, stochastic=False)
    assert out.shape == x_init.shape
    # with eps=0 the update only rescales by 1/sqrt(alpha) each step
    scale = np.prod(1.0 / np.sqrt(sched.alpha[1:]))
    assert np.allclose(np.asarray(out), np.asarray(x_init) * scale, rtol=1e-3)


def test_ddpm_sample_stochastic_reproducible():
    sched = NoiseSchedule.linear(20)
    rng = jax.random.PRNGKey(7)
    x = jax.random.normal(rng, (1, 4, 8, 4))
    eps_fn = lambda xx, t: 0.1 * xx
    o1 = ddpm_sample(sched, eps_fn, rng, x, stochastic=True)
    o2 = ddpm_sample(sched, eps_fn, rng, x, stochastic=True)
    assert np.array_equal(np.asarray(o1), np.asarray(o2))
    o3 = ddpm_sample(sched, eps_fn, jax.random.PRNGKey(8), x)
    assert not np.array_equal(np.asarray(o1), np.asarray(o3))


def test_skip_mask_reduces_model_calls():
    sched = NoiseSchedule.linear(100)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 4, 8, 4))
    calls = []

    # count model calls via a host callback-free trick: run unjitted
    # scan is still traced; instead compare outputs: masked vs full
    # differ, and masked with all-True equals full.
    mask_full = np.ones(100, bool)
    eps_fn = lambda xx, t: 0.05 * xx
    o_full = ddpm_sample(sched, eps_fn, rng, x, stochastic=False)
    o_all = ddpm_sample(sched, eps_fn, rng, x, stochastic=False, call_mask=mask_full)
    assert np.allclose(np.asarray(o_full), np.asarray(o_all))

    mask = regen_call_mask(100, epoch=0)
    o_skip = ddpm_sample(sched, eps_fn, rng, x, stochastic=False, call_mask=mask)
    assert not np.allclose(np.asarray(o_skip), np.asarray(o_full))
    assert np.all(np.isfinite(np.asarray(o_skip)))


def test_cfg_lerp():
    sched = NoiseSchedule.linear(10)
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((1, 2, 2, 1))
    cond = lambda xx, t: jnp.ones_like(xx)
    uncond = lambda xx, t: jnp.zeros_like(xx)
    # scale 1.0 -> pure cond
    o1 = ddpm_sample(sched, cond, rng, x, stochastic=False,
                     cfg_scale=1.0, uncond_eps_fn=uncond)
    o2 = ddpm_sample(sched, cond, rng, x, stochastic=False)
    assert np.allclose(np.asarray(o1), np.asarray(o2))


def test_postprocess():
    x = jnp.array([[-2.0, 0.0, 2.0]])
    u = pixel_to_uint8(x)
    assert u.dtype == jnp.uint8
    assert u.tolist() == [[0, 127, 255]]

    img = latent_to_image(jnp.ones((1, 2, 2, 4)), lambda z: z * 4 - 2.0)
    assert float(img.min()) >= 0.0 and float(img.max()) <= 1.0


def test_ddim_shapes_and_determinism():
    from worddiffusion_tpu.diffusion.sampler import ddim_sample

    sched = NoiseSchedule.linear(600)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 4, 8, 4))
    eps_fn = lambda xx, t: 0.1 * xx
    o1 = ddim_sample(sched, eps_fn, rng, x, num_steps=10, eta=0.0)
    o2 = ddim_sample(sched, eps_fn, rng, x, num_steps=10, eta=0.0)
    assert o1.shape == x.shape
    assert np.array_equal(np.asarray(o1), np.asarray(o2))
    assert np.all(np.isfinite(np.asarray(o1)))


def test_ddim_with_perfect_zero_eps_recovers_x0_scale():
    from worddiffusion_tpu.diffusion.sampler import ddim_sample

    # eps==0 -> x0 estimate = x/sqrt(a_cur); final step lands on x0
    sched = NoiseSchedule.linear(100)
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (1, 4, 8, 2))
    eps_fn = lambda xx, t: jnp.zeros_like(xx)
    out = ddim_sample(sched, eps_fn, rng, x, num_steps=5, eta=0.0)
    expected = np.asarray(x) / np.sqrt(sched.alpha_hat[99])
    assert np.allclose(np.asarray(out), expected, rtol=1e-3)


def test_ddim_eta_adds_noise():
    from worddiffusion_tpu.diffusion.sampler import ddim_sample

    sched = NoiseSchedule.linear(100)
    rng = jax.random.PRNGKey(2)
    x = jax.random.normal(rng, (1, 4, 8, 2))
    eps_fn = lambda xx, t: 0.05 * xx
    det = ddim_sample(sched, eps_fn, rng, x, num_steps=8, eta=0.0)
    sto = ddim_sample(sched, eps_fn, rng, x, num_steps=8, eta=1.0)
    assert not np.array_equal(np.asarray(det), np.asarray(sto))
