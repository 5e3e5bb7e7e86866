"""Checkpointing tests: orbax round trip, latest-checkpoint discovery, torch
interop (state export + relearn-embeds flow)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from osu_diffusion_tpu.models.dit import DiT, DiTConfig
from osu_diffusion_tpu.parallel.train_step import create_train_state, make_optimizer
from osu_diffusion_tpu.train import checkpoint as ck

CTX = 144


def _state():
    model = DiT(DiTConfig(hidden_size=32, depth=1, num_heads=2, num_classes=6,
                          context_size=CTX, class_dropout_prob=0.1))
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 2)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 4)), jnp.zeros((1, 4, CTX)), jnp.zeros((1,), jnp.int32),
    )["params"]
    opt = make_optimizer()
    return model, create_train_state(params, opt), opt


def test_orbax_round_trip(tmp_path):
    model, state, opt = _state()
    state = state.replace(step=jnp.asarray(42, jnp.int32))
    path = ck.save_train_state(str(tmp_path), state, 42)
    assert path.endswith("0000042")
    _, fresh, _ = _state()
    restored = ck.restore_train_state(path, fresh)
    assert int(restored.step) == 42
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored.params, state.params,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored.ema_params, state.ema_params,
    )


def test_latest_checkpoint(tmp_path):
    model, state, _ = _state()
    assert ck.latest_checkpoint(str(tmp_path)) is None
    ck.save_train_state(str(tmp_path), state, 10)
    ck.save_train_state(str(tmp_path), state, 200)
    ck.save_train_state(str(tmp_path), state, 30)
    latest = ck.latest_checkpoint(str(tmp_path))
    assert latest.endswith("0000200")


def test_restore_params_any_from_orbax(tmp_path):
    model, state, _ = _state()
    # make ema distinguishable
    state = state.replace(
        ema_params=jax.tree.map(lambda p: p + 1.0, state.params)
    )
    path = ck.save_train_state(str(tmp_path), state, 7)
    params = ck.restore_params_any(path, model)
    # EMA preferred (parity sample.py:34-35)
    np.testing.assert_allclose(
        np.asarray(params["final_layer"]["linear"]["bias"]),
        np.asarray(state.ema_params["final_layer"]["linear"]["bias"]),
    )


def test_torch_save_and_load_round_trip(tmp_path):
    torch = pytest.importorskip("torch")
    model, state, _ = _state()
    state = state.replace(
        params=jax.tree.map(
            lambda p: p + jax.random.normal(jax.random.PRNGKey(1), p.shape) * 0.1,
            state.params,
        )
    )
    pt_path = str(tmp_path / "ckpt.pt")
    ck.save_torch_compatible(pt_path, state, {"model": "test"})
    loaded_model = ck.load_torch_checkpoint(pt_path, prefer_ema=False)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-7
        ),
        loaded_model, state.params,
    )
    loaded_ema = ck.load_torch_checkpoint(pt_path, prefer_ema=True)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-7
        ),
        loaded_ema, state.ema_params,
    )


def test_playfield_size_validation():
    torch = pytest.importorskip("torch")
    model, state, _ = _state()
    sd = ck.params_to_torch_state_dict(state.params)
    sd["xoc_embedder.playfield_size"] = np.array([100.0, 100.0], dtype=np.float32)
    with pytest.raises(ValueError, match="playfield_size"):
        ck.torch_state_dict_to_params(sd)


def test_orbax_round_trip_sharded_state(tmp_path):
    """Checkpoint save/restore with mesh-sharded params (the multi-device
    layout the trainer produces; the save is called by all processes, see
    trainer._after_steps)."""
    from osu_diffusion_tpu.parallel import make_mesh, shard_params

    model = DiT(DiTConfig(hidden_size=32, depth=1, num_heads=2, num_classes=6,
                          context_size=CTX, class_dropout_prob=0.1))
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 2)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 4)), jnp.zeros((1, 4, CTX)), jnp.zeros((1,), jnp.int32),
    )["params"]
    opt = make_optimizer()
    mesh = make_mesh(num_model=2)
    params = shard_params(params, mesh)
    state = create_train_state(params, opt, mesh)
    state = state.replace(step=jnp.asarray(11, jnp.int32))

    path = ck.save_train_state(str(tmp_path), state, 11)

    fresh = create_train_state(shard_params(jax.tree.map(jnp.zeros_like, params), mesh), opt, mesh)
    restored = ck.restore_train_state(path, fresh)
    assert int(restored.step) == 11
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored.params, state.params,
    )
    # restored arrays keep the abstract state's sharding
    emb = restored.params["y_embedder"]["embedding_table"]["embedding"]
    assert emb.sharding.shard_shape(emb.shape)[0] == emb.shape[0] // 2
