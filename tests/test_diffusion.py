"""Diffusion core tests: schedule parity, respacing, q/p math identities, losses,
and scan samplers (reference diffusion/gaussian_diffusion.py, respace.py)."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from osu_diffusion_tpu.diffusion import create_diffusion, get_named_beta_schedule, space_timesteps
from osu_diffusion_tpu.diffusion.schedule import respace_betas
from osu_diffusion_tpu.diffusion.process import (
    discretized_gaussian_log_likelihood,
    mean_flat,
    normal_kl,
)


def test_cosine_schedule_values():
    betas = get_named_beta_schedule("squaredcos_cap_v2", 1000)
    assert betas.shape == (1000,)
    # closed form for the first beta
    a = lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
    assert betas[0] == pytest.approx(min(1 - a(1 / 1000) / a(0), 0.999))
    assert betas[-1] == pytest.approx(0.999)  # capped
    assert (betas > 0).all() and (betas <= 0.999).all()


def test_linear_schedule_values():
    betas = get_named_beta_schedule("linear", 1000)
    assert betas[0] == pytest.approx(0.0001)
    assert betas[-1] == pytest.approx(0.02)


def test_space_timesteps_ddim_and_sections():
    assert space_timesteps(1000, "ddim10") == set(range(0, 1000, 100))
    s = space_timesteps(1000, "250")
    assert len(s) == 250 and 0 in s
    s2 = space_timesteps(300, [10, 15, 20])
    assert len(s2) == 45


def test_respace_preserves_alpha_cumprod():
    betas = get_named_beta_schedule("squaredcos_cap_v2", 1000)
    keep = space_timesteps(1000, "50")
    new_betas, tmap = respace_betas(betas, keep)
    full_acp = np.cumprod(1 - betas)
    new_acp = np.cumprod(1 - new_betas)
    # alphas_cumprod at the retained steps must be identical (respace.py:78-85)
    np.testing.assert_allclose(new_acp, full_acp[tmap], rtol=1e-10)
    assert tmap.shape == (50,) and new_betas.shape == (50,)


def test_q_sample_and_posterior_identities():
    d = create_diffusion("", noise_schedule="squaredcos_cap_v2")
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (4, 8, 2))
    noise = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 2))
    t = jnp.array([0, 10, 500, 999])
    xt = d.q_sample(x0, t, noise)
    # recover eps from (x0, xt) inversion
    eps = d._predict_eps_from_xstart(xt, t, x0)
    np.testing.assert_allclose(np.asarray(eps), np.asarray(noise), rtol=1e-3, atol=1e-3)
    # recover x0 from eps
    x0_hat = d._predict_xstart_from_eps(xt, t, noise)
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), rtol=1e-2, atol=1e-3)


def test_q_mean_variance():
    d = create_diffusion("")
    x0 = jnp.ones((2, 3, 2))
    t = jnp.array([0, 999])
    mean, var, logvar = d.q_mean_variance(x0, t)
    np.testing.assert_allclose(
        np.asarray(mean[0]), np.sqrt(1 - d.betas[0]) * np.ones((3, 2)), rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(var), np.exp(np.asarray(logvar)), rtol=5e-4)


def test_normal_kl_zero_for_identical():
    kl = normal_kl(1.5, 0.3, 1.5, 0.3)
    assert float(kl) == pytest.approx(0.0, abs=1e-7)


def test_discretized_gaussian_ll_is_prob():
    x = jnp.zeros((1, 4, 2))
    ll = discretized_gaussian_log_likelihood(x, means=x, log_scales=jnp.full_like(x, -5.0))
    assert np.all(np.asarray(ll) <= 0.0)


def _toy_model(out_scale=0.0):
    """Model predicting eps=0 and var_values=0 -> deterministic chain."""

    def fn(x, t, **kw):
        return jnp.concatenate([jnp.zeros_like(x) + out_scale, jnp.zeros_like(x)], axis=-1)

    return fn


def test_p_mean_variance_learned_range_interp():
    d = create_diffusion("")
    x = jnp.ones((2, 4, 2))
    t = jnp.array([5, 100])
    out = d.p_mean_variance(_toy_model(), x, t)
    # var_values = 0 -> frac = 0.5: log-var midway between posterior and beta
    min_log = np.asarray(d.posterior_log_variance_clipped)[np.asarray(t)]
    max_log = np.asarray(d.log_betas)[np.asarray(t)]
    want = 0.5 * (min_log + max_log)
    got = np.asarray(out["log_variance"])[:, 0, 0]
    np.testing.assert_allclose(got, want, rtol=1e-5)
    assert out["pred_xstart"].shape == x.shape


def test_pred_xstart_clip_range():
    d = create_diffusion("")
    x = jnp.full((1, 2, 2), 100.0)
    t = jnp.array([999])
    out = d.p_mean_variance(_toy_model(), x, t, clip_denoised=True)
    x0 = np.asarray(out["pred_xstart"])
    # parity quirk: clamp to [-1, 2] (gaussian_diffusion.py:345)
    assert x0.min() >= -1.0 and x0.max() <= 2.0


def test_p_sample_loop_shapes_and_determinism():
    d = create_diffusion("10")  # 10 respaced steps
    assert d.num_timesteps == 10
    rng = jax.random.PRNGKey(42)
    fn = jax.jit(lambda r: d.p_sample_loop(_toy_model(), (2, 6, 2), r))
    s1 = fn(rng)
    s2 = fn(rng)
    assert s1.shape == (2, 6, 2)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_p_sample_loop_progressive_stacks_steps():
    d = create_diffusion("5")
    rng = jax.random.PRNGKey(0)
    all_s = d.p_sample_loop_progressive(_toy_model(), (1, 4, 2), rng)
    assert all_s.shape == (5, 1, 4, 2)
    final = d.p_sample_loop(_toy_model(), (1, 4, 2), rng)
    np.testing.assert_allclose(np.asarray(all_s[-1]), np.asarray(final))


def test_ddim_loop_deterministic_eta0():
    d = create_diffusion("ddim10")
    rng = jax.random.PRNGKey(3)
    noise = jax.random.normal(rng, (2, 4, 2))
    s1 = d.ddim_sample_loop(_toy_model(), (2, 4, 2), rng, noise=noise)
    s2 = d.ddim_sample_loop(_toy_model(), (2, 4, 2), jax.random.PRNGKey(99), noise=noise)
    # eta=0: no stochasticity beyond the initial noise
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)


def test_timestep_map_passed_to_model():
    d = create_diffusion("10")
    seen = []

    def spy(x, t, **kw):
        seen.append(np.asarray(t))
        return jnp.concatenate([jnp.zeros_like(x), jnp.zeros_like(x)], axis=-1)

    x = jnp.zeros((1, 2, 2))
    d.p_mean_variance(spy, x, jnp.array([9]))
    # local step 9 of a 10-step respacing of 1000 maps to original step ~999
    assert int(seen[0][0]) == int(np.asarray(d.timestep_map)[9])
    assert int(np.asarray(d.timestep_map)[9]) > 900


def test_training_losses_l1_with_vb():
    d = create_diffusion("", use_l1=True)
    assert d.loss_type == "l1"
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (3, 8, 2))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([0, 500, 999])
    terms = d.training_losses(_toy_model(), x0, t, noise)
    assert set(terms) == {"l1", "vb", "loss"}
    # model predicts 0 eps -> l1 = mean |noise|
    want = np.abs(np.asarray(noise)).mean(axis=(1, 2))
    np.testing.assert_allclose(np.asarray(terms["l1"]), want, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(terms["loss"]), np.asarray(terms["l1"] + terms["vb"]), rtol=1e-6
    )


def test_training_losses_mse_no_learn_sigma():
    d = create_diffusion("", learn_sigma=False)

    def fn(x, t, **kw):
        return jnp.zeros_like(x)

    x0 = jnp.ones((2, 4, 2))
    noise = jnp.full_like(x0, 0.5)
    terms = d.training_losses(fn, x0, jnp.array([3, 700]), noise)
    assert "vb" not in terms
    np.testing.assert_allclose(np.asarray(terms["mse"]), 0.25, rtol=1e-5)


def test_rescaled_l1_scales_vb():
    d1 = create_diffusion("", use_l1=True, rescale_learned_sigmas=True)
    d2 = create_diffusion("", use_l1=True)
    assert d1.loss_type == "rescaled_l1"
    x0 = jnp.ones((1, 4, 2))
    noise = jnp.zeros_like(x0)
    t = jnp.array([500])
    t1 = d1.training_losses(_toy_model(), x0, t, noise)
    t2 = d2.training_losses(_toy_model(), x0, t, noise)
    # num_timesteps/1000 == 1 here so they coincide; use a respaced one to differ
    d3 = create_diffusion("100", use_l1=True, rescale_learned_sigmas=True)
    d4 = create_diffusion("100", use_l1=True)
    t3 = d3.training_losses(_toy_model(), x0, jnp.array([50]), noise)
    t4 = d4.training_losses(_toy_model(), x0, jnp.array([50]), noise)
    np.testing.assert_allclose(
        np.asarray(t3["vb"]), np.asarray(t4["vb"]) * 0.1, rtol=1e-5
    )


def test_calc_bpd_loop_shapes():
    d = create_diffusion("5")
    x0 = jnp.zeros((2, 4, 2))
    out = d.calc_bpd_loop(_toy_model(), x0, jax.random.PRNGKey(0))
    assert out["vb"].shape == (2, 5)
    assert out["total_bpd"].shape == (2,)
