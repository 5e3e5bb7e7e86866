"""Context-parallel (sequence-sharded) banded attention vs the single-device
reference path, on the 8-virtual-CPU-device mesh.

Capability beyond the reference (its banded mask, sample.py:82-84, is
single-device only): the sequence axis is sharded over the mesh "model" axis
and neighbor halos travel by ppermute (parallel/context.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import osu_diffusion_tpu.ops.pallas_attention as pa
from osu_diffusion_tpu.ops.attention import banded_attention_mask, dot_product_attention
from osu_diffusion_tpu.parallel import make_mesh
from osu_diffusion_tpu.parallel.context import context_parallel_banded_attention


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    orig = pa.pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pa.pl, "pallas_call", patched)


def _qkv(n, h, t, dh, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return tuple(jax.random.normal(k, (n, h, t, dh), jnp.float32) for k in ks)


@pytest.mark.parametrize("use_pallas", [False, True])
@pytest.mark.parametrize("num_model,band,block", [
    (4, 128, 128),   # halo = 1 block
    (2, 48, 64),     # band < block
    (8, 160, 128),   # halo = 2 blocks (band spans block boundary)
])
def test_matches_single_device_banded(use_pallas, num_model, band, block):
    t = num_model * block * 2  # 2 blocks per shard
    q, k, v = _qkv(2, 2, t, 16)
    mesh = make_mesh(num_model=num_model)
    with mesh:
        got = context_parallel_banded_attention(
            q, k, v, band, mesh, axis="model", block=block,
            use_pallas=use_pallas, matmul_dtype=jnp.float32,
        )
    want = dot_product_attention(q, k, v, banded_attention_mask(t, band))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("use_pallas", [False, True])
def test_valid_len_masks_padded_tail_across_shards(use_pallas):
    """A padded global tail must be masked no matter which shard holds it."""
    num_model, band, block = 4, 96, 64
    t = num_model * block * 2      # 512
    t_real = 380                   # tail lands inside shard 2 of 4
    q, k, v = _qkv(1, 2, t_real, 16, seed=3)
    g = jax.random.normal(jax.random.PRNGKey(9), (1, 2, t - t_real, 16)) * 30
    qp = jnp.concatenate([q, g], axis=2)
    kp = jnp.concatenate([k, g], axis=2)
    vp = jnp.concatenate([v, g], axis=2)
    mesh = make_mesh(num_model=num_model)
    with mesh:
        got = context_parallel_banded_attention(
            qp, kp, vp, band, mesh, axis="model", block=block,
            use_pallas=use_pallas, valid_len=t_real, matmul_dtype=jnp.float32,
        )
    want = dot_product_attention(q, k, v, banded_attention_mask(t_real, band))
    np.testing.assert_allclose(
        np.asarray(got)[:, :, :t_real, :], np.asarray(want), rtol=2e-4, atol=2e-5
    )


def test_jit_with_sharded_inputs():
    """The op composes with jit + explicitly sharded operands (the sampling
    deployment shape: batch over "data", sequence over "model")."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    num_model, band, block = 4, 128, 128
    t = num_model * block
    q, k, v = _qkv(2, 2, t, 16, seed=5)
    mesh = make_mesh(num_model=num_model)
    sh = NamedSharding(mesh, P(None, None, "model", None))
    q, k, v = (jax.device_put(a, sh) for a in (q, k, v))

    @jax.jit
    def f(q, k, v):
        return context_parallel_banded_attention(
            q, k, v, band, mesh, axis="model", block=block, use_pallas=False
        )

    with mesh:
        got = f(q, k, v)
    want = dot_product_attention(q, k, v, banded_attention_mask(t, band))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_sampler_end_to_end_with_context_parallelism():
    """Full CFG denoise chain with the sequence sharded over the mesh "model"
    axis must equal the single-device banded chain (same rng, same bucket)."""
    from osu_diffusion_tpu.diffusion import create_diffusion
    from osu_diffusion_tpu.models.dit import DiT, DiTConfig
    from osu_diffusion_tpu.sampling import Sampler

    ctx = 144
    model = DiT(DiTConfig(
        hidden_size=32, depth=2, num_heads=2, num_classes=7,
        context_size=ctx, class_dropout_prob=0.1,
    ))
    t = 512  # = 4 shards * 128, so both paths compile the same padded shape
    y = jnp.asarray([3, 7], jnp.int32)  # [cond | null]
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 8, 2)), jnp.zeros((2,), jnp.int32),
        jnp.zeros((2, 8)), jnp.zeros((2, 8, ctx)), jnp.zeros((2,), jnp.int32),
    )["params"]
    leaves, td = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(5), len(leaves))
    params = jax.tree_util.tree_unflatten(
        td, [l + 0.05 * jax.random.normal(k, l.shape) for l, k in zip(leaves, keys)]
    )

    diffusion = create_diffusion("3")
    z = jax.random.normal(jax.random.PRNGKey(1), (2, t, 2))
    o = jnp.cumsum(jnp.ones((2, t)), axis=1) * 100
    c = jax.random.uniform(jax.random.PRNGKey(2), (2, t, ctx))
    band = 128

    plain = Sampler(model, diffusion, cfg_scale=2.0, band=band)(
        params, z, o, c, y, jax.random.PRNGKey(3)
    )
    mesh = make_mesh(num_model=4)
    with mesh:
        cp = Sampler(
            model, diffusion, cfg_scale=2.0, band=band, cp_mesh=mesh,
        )(params, z, o, c, y, jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(cp), np.asarray(plain), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("use_pallas", [False, True])
def test_gradients_match_single_device(use_pallas):
    """CP is TRAINABLE (round-3): grads of the sequence-sharded attention
    match the single-device dense path — ppermute/shard_map transpose plus
    the ranged kernel's custom VJP."""
    num_model, band, block = 4, 96, 64
    t = num_model * block * 2
    q, k, v = _qkv(1, 2, t, 16, seed=5)
    mesh = make_mesh(num_model=num_model)

    def loss_cp(q, k, v):
        with mesh:
            out = context_parallel_banded_attention(
                q, k, v, band, mesh, axis="model", block=block,
                use_pallas=use_pallas, matmul_dtype=jnp.float32,
            )
        return jnp.sum(jnp.sin(out))

    def loss_ref(q, k, v):
        out = dot_product_attention(q, k, v, banded_attention_mask(t, band))
        return jnp.sum(jnp.sin(out))

    g_cp = jax.grad(loss_cp, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_cp, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
        )


def test_train_step_with_context_parallelism():
    """A full training step (loss, AdamW, EMA) with the attention sequence
    axis sharded: grads — hence the updated params — match the single-device
    banded path bit-close. make_train_step(cp_mesh=...)."""
    from osu_diffusion_tpu import CONTEXT_SIZE
    from osu_diffusion_tpu.diffusion import create_diffusion
    from osu_diffusion_tpu.models.dit import DiT, DiTConfig
    from osu_diffusion_tpu.parallel.train_step import (
        create_train_state, make_optimizer, make_train_step,
    )

    num_model, band = 4, 128
    t = num_model * 128  # one block per shard
    model = DiT(DiTConfig(
        hidden_size=32, depth=2, num_heads=2, num_classes=5,
        context_size=CONTEXT_SIZE, class_dropout_prob=0.0, remat=False,
    ))
    n = 2
    raw = jax.random.uniform(jax.random.PRNGKey(0), (n, t, 19))
    prev_xy = jnp.zeros((n, 2))
    y = jnp.asarray([1, 3], jnp.int32)
    params = model.init(
        jax.random.PRNGKey(1), jnp.zeros((n, t, 2)), jnp.zeros((n,), jnp.int32),
        jnp.zeros((n, t)), jnp.zeros((n, t, CONTEXT_SIZE)), y,
    )["params"]
    diffusion = create_diffusion("", noise_schedule="squaredcos_cap_v2")
    opt = make_optimizer(1e-3)
    mesh = make_mesh(num_model=num_model)

    def run(cp):
        step = make_train_step(
            model, diffusion, opt, augment=False,
            compute_dtype=jnp.float32, band=band,
            cp_mesh=mesh if cp else None,
        )
        state = create_train_state(params, opt)
        batch = (raw, prev_xy, y)
        new_state, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(2))
        return new_state, metrics

    with mesh:
        s_cp, m_cp = run(cp=True)
    s_ref, m_ref = run(cp=False)
    np.testing.assert_allclose(
        float(m_cp["loss"]), float(m_ref["loss"]), rtol=1e-5
    )
    flat_cp = jax.tree_util.tree_leaves(s_cp.params)
    flat_ref = jax.tree_util.tree_leaves(s_ref.params)
    for a, b in zip(flat_cp, flat_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )


def test_flash_block_plumbs_through_cp_branch():
    """multi_head_attention forwards flash_block into the CP path (round-4
    advisor: it was silently dropped, always using DEFAULT_BLOCK). Outputs
    are block-independent, so 256 must match 128 exactly; the divisibility
    assert inside context_parallel_banded_attention proves the value
    actually arrived (T = p*256 fails for block 512)."""
    from osu_diffusion_tpu.ops.attention import multi_head_attention

    num_model = 2
    t, d, heads = num_model * 256, 32, 2
    x = jax.random.normal(jax.random.PRNGKey(0), (2, t, d), jnp.float32)
    wqkv = jax.random.normal(jax.random.PRNGKey(1), (d, 3 * d)) * 0.1
    bqkv = jnp.zeros((3 * d,))
    wo = jax.random.normal(jax.random.PRNGKey(2), (d, d)) * 0.1
    bo = jnp.zeros((d,))
    mesh = make_mesh(num_model=num_model)
    outs = {}
    with mesh:
        for blk in (128, 256):
            outs[blk] = multi_head_attention(
                x, wqkv, bqkv, wo, bo, heads, band=128,
                cp_mesh=mesh, cp_axis="model", flash_block=blk,
            )
    np.testing.assert_allclose(
        np.asarray(outs[128]), np.asarray(outs[256]), atol=2e-5
    )
