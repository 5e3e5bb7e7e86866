"""Coverage for the less-traveled diffusion paths: DDIM reverse ODE,
cond_fn guidance, fixed-variance modes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from osu_diffusion_tpu.diffusion import create_diffusion


def _zero_eps_model(x, t, **kw):
    return jnp.concatenate([jnp.zeros_like(x), jnp.zeros_like(x)], axis=-1)


def test_ddim_reverse_then_forward_roundtrip():
    """ddim_reverse_sample then ddim_sample (eta=0) must invert each other
    under a deterministic model (reference gaussian_diffusion.py:612-651)."""
    d = create_diffusion("10")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 2)) * 0.3
    t = jnp.array([4, 4])
    fwd = d.ddim_reverse_sample(_zero_eps_model, x, t, clip_denoised=False)
    # reverse step encodes x_t -> x_{t+1}; the matching decode step uses t+1
    back = d.ddim_sample(
        _zero_eps_model, fwd["sample"], t + 1, jax.random.PRNGKey(1),
        clip_denoised=False, eta=0.0,
    )
    np.testing.assert_allclose(
        np.asarray(back["sample"]), np.asarray(x), rtol=1e-3, atol=1e-4
    )


def test_condition_mean_shifts_sample_mean():
    d = create_diffusion("10")
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 2))
    t = jnp.array([5])

    def cond_fn(x, t, **kw):
        return jnp.ones_like(x)  # constant upward gradient

    base = d.p_mean_variance(_zero_eps_model, x, t)
    guided_mean = d.condition_mean(cond_fn, base, x, t)
    # mean shifted by variance * gradient (positive everywhere)
    assert np.all(np.asarray(guided_mean) > np.asarray(base["mean"]))


def test_condition_score_changes_pred_xstart():
    d = create_diffusion("10")
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 2))
    t = jnp.array([5])

    def cond_fn(x, t, **kw):
        return jnp.full_like(x, 0.5)

    base = d.p_mean_variance(_zero_eps_model, x, t, clip_denoised=False)
    out = d.condition_score(cond_fn, base, x, t)
    assert not np.allclose(
        np.asarray(out["pred_xstart"]), np.asarray(base["pred_xstart"])
    )
    # the guided chain runs end to end with cond_fn
    s = d.p_sample_loop(
        _zero_eps_model, (1, 4, 2), jax.random.PRNGKey(1), cond_fn=cond_fn
    )
    assert np.isfinite(np.asarray(s)).all()


@pytest.mark.parametrize("sigma_small", [True, False])
def test_fixed_variance_modes(sigma_small):
    d = create_diffusion("10", learn_sigma=False, sigma_small=sigma_small)
    assert d.model_var_type == ("fixed_small" if sigma_small else "fixed_large")

    def eps_model(x, t, **kw):
        return jnp.zeros_like(x)

    x = jnp.ones((1, 4, 2))
    t = jnp.array([3])
    out = d.p_mean_variance(eps_model, x, t)
    assert out["variance"].shape == (1, 1, 1)
    small = np.asarray(
        create_diffusion("10", learn_sigma=False, sigma_small=True)
        .p_mean_variance(eps_model, x, t)["variance"]
    )
    large = np.asarray(
        create_diffusion("10", learn_sigma=False, sigma_small=False)
        .p_mean_variance(eps_model, x, t)["variance"]
    )
    assert small[0, 0, 0] <= large[0, 0, 0]


def test_kl_loss_type():
    d = create_diffusion("", use_kl=True)
    assert d.loss_type == "rescaled_kl"
    x0 = jnp.zeros((2, 4, 2))
    noise = jnp.zeros_like(x0)
    terms = d.training_losses(_zero_eps_model, x0, jnp.array([5, 500]), noise)
    assert terms["loss"].shape == (2,)
    assert np.isfinite(np.asarray(terms["loss"])).all()


def test_one_step_chain_builds_and_samples():
    """timestep_respacing="1"/"ddim1" (single-step chains) must build without
    indexing past the 1-element coefficient arrays and sample finite values."""
    import jax
    import jax.numpy as jnp

    from osu_diffusion_tpu.diffusion import create_diffusion

    for spacing in ("1", "ddim1"):
        d = create_diffusion(spacing)
        assert d.num_timesteps == 1
        n, t_len = 2, 8

        def model_fn(x, t, **kw):
            return jnp.concatenate([jnp.zeros_like(x), jnp.zeros_like(x)], -1)

        out = d.p_sample_loop(
            model_fn, (n, t_len, 2), jax.random.PRNGKey(0), clip_denoised=True
        )
        assert bool(jnp.all(jnp.isfinite(out))), spacing
