"""Train step, EMA, freezing, sampler, and multi-device sharding tests
(8 virtual CPU devices via conftest)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from osu_diffusion_tpu.diffusion import create_diffusion
from osu_diffusion_tpu.models.dit import DiT, DiTConfig
from osu_diffusion_tpu.parallel import (
    TrainState,
    batch_sharding,
    make_mesh,
    make_train_step,
    shard_params,
)
from osu_diffusion_tpu.parallel.train_step import create_train_state, make_optimizer
from osu_diffusion_tpu.sampling import Sampler, prepare_cfg_inputs

CTX = 144


def _model():
    return DiT(DiTConfig(
        hidden_size=64, depth=2, num_heads=4, num_classes=10,
        context_size=CTX, class_dropout_prob=0.2,
    ))


def _batch(n=4, t=16, seed=0):
    r = np.random.RandomState(seed)
    raw = r.rand(n, t, 19).astype(np.float32)
    raw[..., :2] *= [512, 384]
    raw[..., 2] = np.cumsum(r.rand(n, t), axis=1) * 200
    prev = np.tile([256.0, 192.0], (n, 1)).astype(np.float32)
    y = r.randint(0, 10, (n,)).astype(np.int32)
    return jnp.asarray(raw), jnp.asarray(prev), jnp.asarray(y)


def _init_state(model, opt):
    raw, prev, y = _batch()
    x = jnp.zeros((4, 16, 2))
    params = model.init(
        jax.random.PRNGKey(0), x, jnp.zeros((4,), jnp.int32),
        jnp.zeros((4, 16)), jnp.zeros((4, 16, CTX)), y,
    )["params"]
    return create_train_state(params, opt)


def test_train_step_runs_and_decreases_loss():
    model = _model()
    diffusion = create_diffusion("", noise_schedule="squaredcos_cap_v2", use_l1=True)
    opt = make_optimizer(lr=1e-3)
    state = _init_state(model, opt)
    step = jax.jit(make_train_step(model, diffusion, opt, compute_dtype=jnp.float32))
    batch = _batch()
    rng = jax.random.PRNGKey(42)
    losses = []
    for i in range(12):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 12
    assert "l1" in metrics and "vb" in metrics
    # same batch repeatedly -> loss must trend down
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


def test_ema_tracks_params():
    model = _model()
    diffusion = create_diffusion("", use_l1=True)
    opt = make_optimizer(lr=1e-3)
    state = _init_state(model, opt)
    step = jax.jit(make_train_step(model, diffusion, opt, ema_decay=0.5,
                                   compute_dtype=jnp.float32))
    p0 = state.params["final_layer"]["adaLN"]["kernel"]
    state, _ = step(state, _batch(), jax.random.PRNGKey(0))
    e1 = state.ema_params["final_layer"]["adaLN"]["kernel"]
    p1 = state.params["final_layer"]["adaLN"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(e1), 0.5 * np.asarray(p0) + 0.5 * np.asarray(p1), atol=1e-7
    )


def test_trainable_mask_freezes_params():
    """Embedding-only training (reference --embed-only-epochs, train.py:223-241):
    everything except the label table frozen."""
    model = _model()
    diffusion = create_diffusion("", use_l1=True)
    opt = make_optimizer(lr=1e-2)
    state = _init_state(model, opt)
    mask = jax.tree_util.tree_map_with_path(
        lambda path, _: "embedding_table" in "/".join(getattr(p, "key", "") for p in path),
        state.params,
    )
    step = jax.jit(make_train_step(model, diffusion, opt, trainable_mask=mask,
                                   compute_dtype=jnp.float32))
    before = jax.tree.map(np.asarray, state.params)
    # several steps: adaLN-Zero blocks upstream grads until the final linear
    # becomes nonzero, so one step would leave the table untouched... but the
    # final linear itself is frozen here; seed the table path by pre-perturbing
    # the final linear so gradients reach the embedding immediately
    state = state.replace(params=jax.tree_util.tree_map_with_path(
        lambda path, p: p + 0.01 if "final_layer" in "/".join(
            getattr(q, "key", "") for q in path) else p,
        state.params,
    ))
    for i in range(3):
        state, _ = step(state, _batch(), jax.random.PRNGKey(1 + i))
    after = state.params
    # table moved
    assert not np.allclose(
        before["y_embedder"]["embedding_table"]["embedding"],
        np.asarray(after["y_embedder"]["embedding_table"]["embedding"]),
    )
    # a frozen kernel did not
    np.testing.assert_array_equal(
        before["blocks_0"]["mlp_fc1"]["kernel"],
        np.asarray(after["blocks_0"]["mlp_fc1"]["kernel"]),
    )


def test_multi_step_matches_sequential_singles():
    """k scanned steps == k sequential single steps (same rng fold-in chain)."""
    from osu_diffusion_tpu.parallel.train_step import make_multi_train_step

    model = _model()
    diffusion = create_diffusion("", use_l1=True)
    opt = make_optimizer(lr=1e-3)
    single = make_train_step(model, diffusion, opt, compute_dtype=jnp.float32)
    k = 3
    multi = jax.jit(make_multi_train_step(single, k))
    single_j = jax.jit(single)
    rng = jax.random.PRNGKey(7)

    batches = [_batch(seed=s) for s in range(k)]
    stacked = tuple(jnp.stack([b[i] for b in batches]) for i in range(3))

    s_a = _init_state(model, opt)
    s_a, m_multi = multi(s_a, stacked, rng)

    s_b = _init_state(model, opt)
    losses = []
    for b in batches:
        s_b, m = single_j(s_b, b, rng)
        losses.append(m["loss"])

    assert int(s_a.step) == int(s_b.step) == k
    np.testing.assert_allclose(
        np.asarray(m_multi["loss"]), np.mean([float(l) for l in losses]), rtol=1e-5
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        ),
        s_a.params, s_b.params,
    )


def test_mesh_and_sharded_train_step():
    """Full DP+TP train step over a 4x2 virtual mesh."""
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(num_model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    model = _model()
    diffusion = create_diffusion("", use_l1=True)
    opt = make_optimizer()
    state = _init_state(model, opt)
    with mesh:
        params = shard_params(state.params, mesh)
        # embedding table rows sharded over "model" (half the rows per shard)
        emb = params["y_embedder"]["embedding_table"]["embedding"]
        assert emb.sharding.shard_shape(emb.shape)[0] == emb.shape[0] // 2
        state = create_train_state(params, opt, mesh)
        step = jax.jit(make_train_step(model, diffusion, opt,
                                       compute_dtype=jnp.float32))
        batch = jax.device_put(_batch(8, 16), batch_sharding(mesh))
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        # params keep their sharding through the update
        emb2 = state.params["y_embedder"]["embedding_table"]["embedding"]
        assert emb2.sharding.shard_shape(emb2.shape)[0] == emb2.shape[0] // 2


def test_sampler_cfg_end_to_end():
    model = _model()
    diffusion = create_diffusion("4", use_l1=True)  # 4 steps: fast
    raw, prev, y = _batch(2, 16)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 16, 2)), jnp.zeros((2,), jnp.int32),
        jnp.zeros((2, 16)), jnp.zeros((2, 16, CTX)), y,
    )["params"]
    sampler = Sampler(model, diffusion, cfg_scale=2.0, band=8)
    seq_o = np.arange(16, dtype=np.float32) * 100
    seq_c = np.random.RandomState(0).rand(16, CTX).astype(np.float32)
    z, o, c, yy = prepare_cfg_inputs(None, seq_o, seq_c, [3], 10, jax.random.PRNGKey(1))
    assert z.shape == (2, 16, 2) and int(yy[1]) == 10
    out = sampler(params, z, o, c, yy, jax.random.PRNGKey(2))
    assert out.shape == (2, 16, 2)
    assert np.isfinite(np.asarray(out)).all()
    # determinism
    out2 = sampler(params, z, o, c, yy, jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_sampler_bucketing_pads_and_slices():
    model = _model()
    diffusion = create_diffusion("2")
    y = jnp.zeros((2,), jnp.int32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 8, 2)), jnp.zeros((2,), jnp.int32),
        jnp.zeros((2, 8)), jnp.zeros((2, 8, CTX)), y,
    )["params"]
    sampler = Sampler(model, diffusion, band=4, bucket=32)
    t = 20  # not a multiple of the bucket
    z = jax.random.normal(jax.random.PRNGKey(0), (2, t, 2))
    o = jnp.zeros((2, t))
    c = jnp.zeros((2, t, CTX))
    out = sampler(params, z, o, c, y, jax.random.PRNGKey(1))
    assert out.shape == (2, t, 2)


def test_sampler_inpaint_keeps_known_coords():
    model = _model()
    diffusion = create_diffusion("3")
    y = jnp.zeros((1,), jnp.int32)
    t = 8
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, t, 2)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, t)), jnp.zeros((1, t, CTX)), y,
    )["params"]
    sampler = Sampler(model, diffusion, bucket=8)
    known = jnp.full((1, t, 2), 0.25)
    mask = jnp.zeros((1, t, 2), bool).at[:, -1, :].set(True)  # only last is free
    z = jax.random.normal(jax.random.PRNGKey(3), (1, t, 2))
    out = sampler(
        params, z, jnp.zeros((1, t)), jnp.zeros((1, t, CTX)), y,
        jax.random.PRNGKey(4), known_x=known, known_mask=mask, use_cfg=False,
    )
    # all known positions preserved exactly (in-paint applied at the final t=0
    # step through denoised_fn, test_toy.py:57-69 semantics)
    np.testing.assert_allclose(np.asarray(out[:, :-1, :]), 0.25, atol=1e-6)
