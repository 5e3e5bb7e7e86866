"""Opt-in bf16 sampling mode (Sampler(compute_dtype=bf16), --compute-dtype).

Documented as a non-parity serving mode: a single denoise step matches f32 to
bf16 rounding, while a full stochastic chain may diverge point-wise (clamp
boundaries amplify rounding) — same as any reduced-precision sampler.
"""
import jax
import jax.numpy as jnp
import numpy as np

from osu_diffusion_tpu.diffusion import create_diffusion
from osu_diffusion_tpu.models.dit import DiT, DiTConfig
from osu_diffusion_tpu.sampling import Sampler


def _setup():
    ctx = 144
    model = DiT(DiTConfig(
        hidden_size=32, depth=2, num_heads=2, num_classes=7,
        context_size=ctx, class_dropout_prob=0.1,
    ))
    t = 96
    y = jnp.asarray([3, 7], jnp.int32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 8, 2)), jnp.zeros((2,), jnp.int32),
        jnp.zeros((2, 8)), jnp.zeros((2, 8, ctx)), jnp.zeros((2,), jnp.int32),
    )["params"]
    leaves, td = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(5), len(leaves))
    params = jax.tree_util.tree_unflatten(
        td, [l + 0.04 * jax.random.normal(k, l.shape) for l, k in zip(leaves, keys)]
    )
    z = jax.random.normal(jax.random.PRNGKey(1), (2, t, 2))
    o = jnp.cumsum(jnp.ones((2, t)), axis=1) * 100
    c = jax.random.uniform(jax.random.PRNGKey(2), (2, t, ctx))
    return model, params, z, o, c, y


def test_single_model_call_bf16_close_to_f32():
    """One DiT forward in bf16 vs f32 — the per-step error is bf16-rounding
    sized, not structural."""
    model, params, z, o, c, y = _setup()
    t_arr = jnp.full((2,), 500, jnp.int32)
    out32 = model.apply({"params": params}, z, t_arr, o, c, y)
    # inputs stay f32; the stream dtype is the explicit knob — quantizing the
    # inputs instead would scramble the high-frequency sincos embeddings
    out16 = model.apply(
        {"params": params}, z, t_arr, o, c, y, dtype=jnp.bfloat16
    ).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32), atol=0.03)


def test_bf16_chain_runs_and_is_bounded():
    """The full chain in bf16 produces f32 output in the model's value range
    and genuinely runs a different program than f32 (not a cast at the end)."""
    model, params, z, o, c, y = _setup()
    diffusion = create_diffusion("4")
    f32 = Sampler(model, diffusion, cfg_scale=2.0, band=64)(
        params, z, o, c, y, jax.random.PRNGKey(3)
    )
    bf16 = Sampler(model, diffusion, cfg_scale=2.0, band=64,
                   compute_dtype=jnp.bfloat16)(
        params, z, o, c, y, jax.random.PRNGKey(3)
    )
    assert bf16.dtype == jnp.float32
    assert np.all(np.asarray(bf16) >= -1.0) and np.all(np.asarray(bf16) <= 2.0)
    # most elements agree closely; a small clamp-boundary tail may diverge
    close = np.isclose(np.asarray(bf16), np.asarray(f32), atol=0.12).mean()
    assert close > 0.85, close
    assert not np.allclose(np.asarray(bf16), np.asarray(f32), atol=1e-6)
