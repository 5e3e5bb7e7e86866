"""Fused adaLN-MLP kernel vs the reference jnp path (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import osu_diffusion_tpu.ops.pallas_mlp as pm


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    orig = pm.pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pm.pl, "pallas_call", patched)


def _inputs(n=2, t=16, d=32, h=64, seed=0):
    r = jax.random.PRNGKey(seed)
    ks = jax.random.split(r, 8)
    return (
        jax.random.normal(ks[0], (n, t, d)),
        jax.random.normal(ks[1], (n, d)) * 0.1,
        jax.random.normal(ks[2], (n, d)) * 0.1,
        jax.random.normal(ks[3], (n, d)) * 0.1,
        jax.random.normal(ks[4], (d, h)) * 0.05,
        jax.random.normal(ks[5], (h,)) * 0.05,
        jax.random.normal(ks[6], (h, d)) * 0.05,
        jax.random.normal(ks[7], (d,)) * 0.05,
    )


@pytest.mark.parametrize("t,block_t", [(16, 16), (32, 8), (20, 16)])
def test_kernel_matches_reference(t, block_t):
    args = _inputs(t=t)
    got = pm.adaln_mlp(*args, block_t, 1e-6, jnp.float32)
    want = pm._reference_impl(*args, eps=1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_matches_dit_block_mlp_half():
    """The kernel must equal the DiTBlock XLA MLP half exactly (same LN, same
    modulate, same GELU-tanh, same gate+residual)."""
    import flax.linen as nn

    args = _inputs()
    x, shift, scale, gate, w1, b1, w2, b2 = args
    ln = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False)
    h = ln.apply({}, x) * (1 + scale[:, None, :]) + shift[:, None, :]
    h = jnp.dot(h, w1) + b1
    h = nn.gelu(h, approximate=True)
    h = jnp.dot(h, w2) + b2
    want = x + gate[:, None, :] * h
    got = pm.adaln_mlp(*args, 16, 1e-6, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("bwd_impl", ["xla", "fused"])
def test_gradients_match_reference(bwd_impl):
    args = _inputs(t=8, d=16, h=32)

    def loss_kernel(*a):
        return jnp.sum(pm.adaln_mlp(*a, 8, 1e-6, jnp.float32, bwd_impl) ** 2)

    def loss_ref(*a):
        return jnp.sum(pm._reference_impl(*a, eps=1e-6) ** 2)

    g_got = jax.grad(loss_kernel, argnums=tuple(range(8)))(*args)
    g_want = jax.grad(loss_ref, argnums=tuple(range(8)))(*args)
    for a, b in zip(g_got, g_want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_model_level_pallas_mlp_consistency():
    """DiT forward with use_pallas (no band -> attention stays XLA, MLP fused)
    must match the plain path."""
    import osu_diffusion_tpu.ops.pallas_attention  # noqa: F401
    from osu_diffusion_tpu.models.dit import DiT, DiTConfig

    model = DiT(DiTConfig(hidden_size=32, depth=2, num_heads=2, num_classes=4,
                          context_size=144, class_dropout_prob=0.1))
    r = np.random.RandomState(0)
    n, t = 2, 16
    x = jnp.asarray(r.rand(n, t, 2), jnp.float32)
    ts = jnp.asarray(r.randint(0, 1000, (n,)))
    o = jnp.asarray(r.rand(n, t) * 100, jnp.float32)
    c = jnp.asarray(r.rand(n, t, 144), jnp.float32)
    y = jnp.asarray(r.randint(0, 4, (n,)))
    params = model.init(jax.random.PRNGKey(0), x, ts, o, c, y)
    # make outputs nonzero
    params = jax.tree.map(
        lambda p: p + 0.02 * jax.random.normal(jax.random.PRNGKey(5), p.shape), params
    )
    plain = model.apply(params, x, ts, o, c, y)
    fused = model.apply(params, x, ts, o, c, y, use_pallas=True)
    # production kernels use bf16 matmul inputs -> bf16-level agreement
    np.testing.assert_allclose(np.asarray(fused), np.asarray(plain), rtol=3e-2, atol=3e-2)


def test_gradients_match_reference_multi_h_block():
    """Training-mode residual outputs (pre-GELU `a`, pre-gate mlp) are written
    per hidden block; grads must still match with >1 h-block and ragged T."""
    args = _inputs(t=20, d=32, h=256)

    def loss_kernel(*a):
        return jnp.sum(pm.adaln_mlp(*a, 16, 1e-6, jnp.float32) ** 3)

    def loss_ref(*a):
        return jnp.sum(pm._reference_impl(*a, eps=1e-6) ** 3)

    g_got = jax.grad(loss_kernel, argnums=tuple(range(8)))(*args)
    g_want = jax.grad(loss_ref, argnums=tuple(range(8)))(*args)
    for a, b in zip(g_got, g_want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("t,block_t,h", [(16, 16, 64), (20, 16, 64), (24, 8, 128)])
def test_fused_backward_matches_xla(t, block_t, h):
    """The Pallas fused backward (stage-1/stage-2 kernels) must produce the
    same cotangents as the plain-jnp backward for an arbitrary upstream grad,
    including ragged T (zero-padded tail) and multi-batch accumulation."""
    args = _inputs(t=t, h=h, n=3)
    d = args[0].shape[2]
    g = jax.random.normal(jax.random.PRNGKey(9), (3, t, d))

    def run(impl):
        f = lambda *a: pm.adaln_mlp(*a, block_t, 1e-6, jnp.float32, impl)
        out, vjp = jax.vjp(f, *args)
        return out, vjp(g)

    out_f, grads_f = run("fused")
    out_x, grads_x = run("xla")
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x), rtol=1e-5)
    for a, b in zip(grads_f, grads_x):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4
        )


def test_fused_backward_multi_h_block():
    """Explicit small block_h exercises the cross-H-block accumulation paths
    (db1 rows, the dh1 VMEM scratch, k==last epilogue) that the default
    block_h picker collapses to one block at toy sizes."""
    args = _inputs(t=20, d=16, h=64, n=3)
    out, res = pm._fwd(*args, 8, 1e-6, jnp.float32, "fused")
    g = jax.random.normal(jax.random.PRNGKey(11), out.shape)
    got = pm._bwd_fused_impl(res, g, 8, 1e-6, jnp.float32, block_h=16)
    want = pm._bwd(8, 1e-6, jnp.float32, res, g)
    assert len(got) == len(want) == 8
    for a, b in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4
        )
