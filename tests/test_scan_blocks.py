"""nn.scan-over-depth layout: output equivalence with the unrolled layout given
the same (converted) weights, converter round trip, and sharding-rule fit."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from osu_diffusion_tpu.models.dit import DiT, DiTConfig
from osu_diffusion_tpu.train.checkpoint import (
    params_to_torch_state_dict,
    torch_state_dict_to_params,
)

CTX = 144


def _cfg(scan):
    return DiTConfig(hidden_size=32, depth=3, num_heads=2, num_classes=4,
                     context_size=CTX, class_dropout_prob=0.1, scan_blocks=scan)


def _inputs(n=2, t=8):
    r = np.random.RandomState(0)
    return (
        jnp.asarray(r.rand(n, t, 2), jnp.float32),
        jnp.asarray(r.randint(0, 1000, (n,))),
        jnp.asarray(r.rand(n, t) * 100, jnp.float32),
        jnp.asarray(r.rand(n, t, CTX), jnp.float32),
        jnp.asarray(r.randint(0, 4, (n,))),
    )


def test_scan_and_unrolled_agree_via_converter():
    x, t, o, c, y = _inputs()
    unrolled = DiT(_cfg(False))
    params_u = unrolled.init(jax.random.PRNGKey(0), x, t, o, c, y)["params"]
    # nonzero weights so blocks matter
    params_u = jax.tree.map(
        lambda p: p + 0.02 * jax.random.normal(jax.random.PRNGKey(1), p.shape),
        params_u,
    )
    sd = params_to_torch_state_dict(params_u)
    params_s = torch_state_dict_to_params(sd, scan_blocks=True)
    assert params_s["blocks"]["adaLN"]["kernel"].shape[0] == 3  # stacked depth

    scanned = DiT(_cfg(True))
    out_u = unrolled.apply({"params": params_u}, x, t, o, c, y)
    out_s = scanned.apply({"params": params_s}, x, t, o, c, y)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_u), rtol=1e-5, atol=1e-5)


def test_scan_converter_round_trip():
    x, t, o, c, y = _inputs()
    scanned = DiT(_cfg(True))
    params = scanned.init(jax.random.PRNGKey(2), x, t, o, c, y)["params"]
    sd = params_to_torch_state_dict(params)
    back = torch_state_dict_to_params(sd, scan_blocks=True)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7),
        params, back,
    )


def test_scan_training_grad_and_sharding():
    from osu_diffusion_tpu.parallel import make_mesh, shard_params

    x, t, o, c, y = _inputs()
    scanned = DiT(_cfg(True))
    params = scanned.init(jax.random.PRNGKey(0), x, t, o, c, y)["params"]

    def loss(p):
        out = scanned.apply(
            {"params": p}, x, t, o, c, y, train=True,
            rngs={"label_dropout": jax.random.PRNGKey(3)},
        )
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(params)  # remat-in-scan path
    assert np.isfinite(float(jax.tree.leaves(g)[0].sum()))

    mesh = make_mesh(num_model=2)
    sharded = shard_params(params, mesh)
    k = sharded["blocks"]["mlp_fc1"]["kernel"]  # (depth, in, out)
    # output axis sharded over "model", depth/in replicated
    assert k.sharding.shard_shape(k.shape) == (3, 32, k.shape[2] // 2)


def test_scan_unroll_agrees():
    """Partial scan unrolling (scan_unroll=3 over depth 3) must not change the
    function — only how many blocks are traced per scan iteration."""
    import dataclasses

    x, t, o, c, y = _inputs()
    scanned = DiT(_cfg(True))
    params = scanned.init(jax.random.PRNGKey(4), x, t, o, c, y)["params"]
    params = jax.tree.map(
        lambda p: p + 0.02 * jax.random.normal(jax.random.PRNGKey(5), p.shape),
        params,
    )
    cfg_u = dataclasses.replace(_cfg(True), scan_unroll=3)
    out1 = scanned.apply({"params": params}, x, t, o, c, y)
    out3 = DiT(cfg_u).apply({"params": params}, x, t, o, c, y)
    np.testing.assert_allclose(np.asarray(out3), np.asarray(out1), rtol=1e-6, atol=1e-6)


def test_restore_params_any_converts_block_layout(tmp_path):
    """An orbax checkpoint saved in one block layout restores into a model of
    the other (the trainer defaults unrolled, the sample CLI defaults scan)."""
    import orbax.checkpoint as ocp

    from osu_diffusion_tpu.train.checkpoint import restore_params_any

    x, t, o, c, y = _inputs()
    unrolled = DiT(_cfg(False))
    params = unrolled.init(jax.random.PRNGKey(7), x, t, o, c, y)["params"]
    params = jax.tree.map(
        lambda p: p + 0.02 * jax.random.normal(jax.random.PRNGKey(8), p.shape),
        params,
    )
    path = str(tmp_path / "ckpt" / "0000001")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, {"ema_params": params})

    scanned = DiT(_cfg(True))
    restored = restore_params_any(path, scanned)
    out_scan = scanned.apply({"params": restored}, x, t, o, c, y)
    out_unrolled = unrolled.apply({"params": params}, x, t, o, c, y)
    np.testing.assert_allclose(
        np.asarray(out_scan), np.asarray(out_unrolled), rtol=1e-5, atol=1e-5
    )

    # and the reverse direction: scan checkpoint -> unrolled model
    path2 = str(tmp_path / "ckpt2" / "0000001")
    scan_params = restored
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path2, {"ema_params": scan_params})
    back = restore_params_any(path2, unrolled)
    out_back = unrolled.apply({"params": back}, x, t, o, c, y)
    np.testing.assert_allclose(
        np.asarray(out_back), np.asarray(out_unrolled), rtol=1e-5, atol=1e-5
    )
