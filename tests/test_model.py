"""DiT model tests: shapes, init parity, CFG semantics, banded mask, and a
golden parity check against the reference torch implementation (skipped when
the reference checkout is unavailable)."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from osu_diffusion_tpu.models import DiT_models
from osu_diffusion_tpu.models.dit import DiT, DiTConfig
from osu_diffusion_tpu.ops.attention import banded_attention_mask

CTX = 144  # feature_size - 3 + 128


def _small_model(**kw):
    defaults = dict(
        hidden_size=64, depth=2, num_heads=4, num_classes=10,
        context_size=CTX, class_dropout_prob=0.1,
    )
    defaults.update(kw)
    return DiT(DiTConfig(**defaults))


def _inputs(n=2, t=8, rng=0):
    r = np.random.RandomState(rng)
    x = jnp.asarray(r.rand(n, t, 2), dtype=jnp.float32)
    ts = jnp.asarray(r.randint(0, 1000, (n,)), dtype=jnp.int32)
    o = jnp.asarray(r.rand(n, t) * 1000, dtype=jnp.float32)
    c = jnp.asarray(r.rand(n, t, CTX), dtype=jnp.float32)
    y = jnp.asarray(r.randint(0, 10, (n,)), dtype=jnp.int32)
    return x, ts, o, c, y


def test_forward_shapes():
    model = _small_model()
    x, t, o, c, y = _inputs()
    params = model.init(jax.random.PRNGKey(0), x, t, o, c, y)
    out = model.apply(params, x, t, o, c, y)
    assert out.shape == (2, 8, 4)  # learn_sigma -> 2*in_channels


def test_adaLN_zero_init_identity_eps():
    """adaLN-Zero: at init every gate/shift/scale and the final linear are zero,
    so the output must be exactly zero (reference models.py:295-304)."""
    model = _small_model()
    x, t, o, c, y = _inputs()
    params = model.init(jax.random.PRNGKey(0), x, t, o, c, y)
    out = model.apply(params, x, t, o, c, y)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_init_statistics():
    model = _small_model()
    x, t, o, c, y = _inputs()
    params = model.init(jax.random.PRNGKey(0), x, t, o, c, y)["params"]
    # std-0.02 normals
    for path in [
        params["xoc_embedder"]["proj"]["kernel"],
        params["t_embedder"]["fc1"]["kernel"],
        params["y_embedder"]["embedding_table"]["embedding"],
    ]:
        assert float(jnp.std(path)) == pytest.approx(0.02, rel=0.2)
    # zero adaLN + final linear
    assert float(jnp.abs(params["blocks_0"]["adaLN"]["kernel"]).max()) == 0.0
    assert float(jnp.abs(params["final_layer"]["linear"]["kernel"]).max()) == 0.0
    # label table has the +1 null row, padded to a multiple of 16 for
    # vocab-parallel sharding
    assert params["y_embedder"]["embedding_table"]["embedding"].shape[0] == 16


def test_label_dropout_train_only():
    model = _small_model(class_dropout_prob=0.5)
    x, t, o, c, y = _inputs()
    params = model.init(jax.random.PRNGKey(0), x, t, o, c, y)
    # eval: deterministic, no dropout rng needed
    out1 = model.apply(params, x, t, o, c, y, train=False)
    out2 = model.apply(params, x, t, o, c, y, train=False)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    # train: requires the label_dropout rng stream
    model.apply(
        params, x, t, o, c, y, train=True,
        rngs={"label_dropout": jax.random.PRNGKey(1)},
    )


def test_force_drop_ids():
    model = _small_model()
    x, t, o, c, y = _inputs()
    params = model.init(jax.random.PRNGKey(0), x, t, o, c, y)
    y_null = jnp.full_like(y, model.config.num_classes)
    out_forced = model.apply(
        params, x, t, o, c, y, force_drop_ids=jnp.ones_like(y)
    )
    out_null = model.apply(params, x, t, o, c, y_null)
    np.testing.assert_allclose(np.asarray(out_forced), np.asarray(out_null), atol=1e-6)


def test_forward_with_cfg_semantics():
    model = _small_model()
    n, t_len = 4, 8  # doubled batch: 2 cond + 2 uncond
    x, t, o, c, y = _inputs(n, t_len, rng=3)
    params = model.init(jax.random.PRNGKey(0), x, t, o, c, y)
    out = model.apply(
        params, x, t, o, c, y, cfg_scale=4.0, method=DiT.forward_with_cfg
    )
    assert out.shape == (4, 8, 4)
    eps = np.asarray(out[..., :2])
    # eps halves are identical copies (reference models.py:342)
    np.testing.assert_array_equal(eps[:2], eps[2:])
    # cfg_scale=1 reduces to the conditional prediction
    out1 = model.apply(
        params, x, t, o, c, y, cfg_scale=1.0, method=DiT.forward_with_cfg
    )
    plain = model.apply(params, jnp.concatenate([x[:2], x[:2]]), t, o, c, y)
    np.testing.assert_allclose(
        np.asarray(out1[..., :2])[:2], np.asarray(plain[..., :2])[:2], atol=1e-5
    )


def test_banded_mask_matches_reference_loop():
    T, L = 12, 3
    got = np.asarray(banded_attention_mask(T, L))
    # reference loop (sample.py:82-84), polarity inverted (True=allowed)
    want = np.zeros((T, T), dtype=bool)
    for i in range(T):
        want[max(0, i - L) : min(T, i + L), i] = True
    np.testing.assert_array_equal(got, want)


def test_banded_attention_changes_output():
    model = _small_model()
    x, t, o, c, y = _inputs(2, 16)
    params = model.init(jax.random.PRNGKey(1), x, t, o, c, y)
    # perturb final linear so outputs are nonzero
    params = jax.tree.map(
        lambda p: p + 0.01 * jax.random.normal(jax.random.PRNGKey(2), p.shape), params
    )
    full = model.apply(params, x, t, o, c, y)
    banded = model.apply(params, x, t, o, c, y, attn_mask=banded_attention_mask(16, 2))
    assert not np.allclose(np.asarray(full), np.asarray(banded))


def test_registry_configs():
    # parity: models.py:410-431
    for name, want in {
        "DiT-XL": (28, 1152, 16),
        "DiT-L": (24, 1024, 16),
        "DiT-B": (12, 768, 12),
        "DiT-S": (12, 384, 6),
    }.items():
        m = DiT_models[name](num_classes=5, context_size=CTX)
        assert (m.config.depth, m.config.hidden_size, m.config.num_heads) == want


def test_param_count_dit_s():
    """Parameter-count parity with the measured reference: DiT-S @ 52,670
    classes = 52.9M (BASELINE.md)."""
    model = DiT_models["DiT-S"](num_classes=52670, context_size=CTX)
    x, t, o, c, y = _inputs()
    params = model.init(jax.random.PRNGKey(0), x, t, o, c, y)["params"]
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    # reference count includes the frozen playfield_size (2,) parameter
    assert n + 2 == pytest.approx(52.9e6, rel=0.01)


# ---------------------------------------------------------------------------
# golden parity vs the reference torch implementation (optional)
# ---------------------------------------------------------------------------

REFERENCE_DIR = os.environ.get("OSU_DIFFUSION_REFERENCE", "/root/reference")


@pytest.mark.skipif(
    not os.path.isdir(REFERENCE_DIR), reason="reference checkout not available"
)
def test_golden_parity_with_torch_reference():
    """Same weights + inputs through reference models.DiT (torch, cpu) and our
    flax DiT must agree to fp32 tolerance (the north-star parity requirement).
    Weights flow through the checkpoint converter, exercising it too."""
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REFERENCE_DIR)
    try:
        import importlib
        ref_models = importlib.import_module("models")
    finally:
        sys.path.remove(REFERENCE_DIR)

    torch.manual_seed(0)
    ref = ref_models.DiT(
        in_channels=2, context_size=CTX, hidden_size=96, depth=2, num_heads=4,
        class_dropout_prob=0.1, num_classes=7, learn_sigma=True,
    )
    ref.eval()

    from osu_diffusion_tpu.train.checkpoint import (
        params_to_torch_state_dict,
        torch_state_dict_to_params,
    )

    params = {"params": torch_state_dict_to_params(ref.state_dict())}
    model = DiT(DiTConfig(
        in_channels=2, context_size=CTX, hidden_size=96, depth=2, num_heads=4,
        class_dropout_prob=0.1, num_classes=7, learn_sigma=True,
    ))

    r = np.random.RandomState(0)
    n, t_len = 2, 16
    x = r.rand(n, 2, t_len).astype(np.float32)
    ts = r.randint(0, 1000, (n,)).astype(np.int64)
    o = (r.rand(n, t_len) * 1000).astype(np.float32)
    c = r.rand(n, CTX, t_len).astype(np.float32)
    y = r.randint(0, 7, (n,)).astype(np.int64)

    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(x), torch.from_numpy(ts), torch.from_numpy(o),
            torch.from_numpy(c), torch.from_numpy(y),
        ).numpy()

    got = model.apply(
        params,
        jnp.asarray(np.swapaxes(x, 1, 2)),
        jnp.asarray(ts),
        jnp.asarray(o),
        jnp.asarray(np.swapaxes(c, 1, 2)),
        jnp.asarray(y),
    )
    got = np.swapaxes(np.asarray(got), 1, 2)  # back to (N, C', T)
    np.testing.assert_allclose(got, ref_out, rtol=1e-4, atol=2e-4)

    # masked attention parity too
    T = t_len
    mask_torch = torch.full((T, T), True, dtype=torch.bool)
    for i in range(T):
        mask_torch[max(0, i - 4): min(T, i + 4), i] = False
    with torch.no_grad():
        ref_masked = ref(
            torch.from_numpy(x), torch.from_numpy(ts), torch.from_numpy(o),
            torch.from_numpy(c), torch.from_numpy(y), attn_mask=mask_torch,
        ).numpy()
    got_masked = model.apply(
        params,
        jnp.asarray(np.swapaxes(x, 1, 2)), jnp.asarray(ts), jnp.asarray(o),
        jnp.asarray(np.swapaxes(c, 1, 2)), jnp.asarray(y),
        attn_mask=banded_attention_mask(T, 4),
    )
    got_masked = np.swapaxes(np.asarray(got_masked), 1, 2)
    np.testing.assert_allclose(got_masked, ref_masked, rtol=1e-4, atol=2e-4)

    # and the converter round-trips (slicing off the vocab padding)
    sd2 = params_to_torch_state_dict(params["params"], num_label_rows=8)
    for k, v in ref.state_dict().items():
        np.testing.assert_allclose(sd2[k], v.numpy(), atol=1e-7)


def test_attn_layout_einsum_matches_packed():
    """attn_layout='einsum' (transposes folded into the projection matmuls) is
    numerically identical to the default packed layout, same param tree."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from osu_diffusion_tpu.models.dit import DiT, DiTConfig

    ctx = 144
    kw = dict(hidden_size=64, depth=2, num_heads=4, num_classes=9,
              context_size=ctx, class_dropout_prob=0.1)
    m_packed = DiT(DiTConfig(**kw))
    m_einsum = DiT(DiTConfig(attn_layout="einsum", **kw))
    n, t = 2, 24
    x = jax.random.normal(jax.random.PRNGKey(0), (n, t, 2))
    ts = jnp.asarray([3, 500], jnp.int32)
    o = jnp.cumsum(jax.random.uniform(jax.random.PRNGKey(1), (n, t)), axis=1) * 99
    c = jax.random.normal(jax.random.PRNGKey(2), (n, t, ctx))
    y = jnp.asarray([1, 4], jnp.int32)
    params = m_packed.init(jax.random.PRNGKey(3), x, ts, o, c, y)["params"]
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(4), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef,
        [l + jax.random.normal(k, l.shape) * 0.02 for l, k in zip(leaves, keys)],
    )
    a = m_packed.apply({"params": params}, x, ts, o, c, y)
    b = m_einsum.apply({"params": params}, x, ts, o, c, y)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6)
