"""int8 weight-only serving: the Pallas quant matmul kernel (interpret mode on
CPU; the same kernel compiles for TPU), the tree converter, and the quantized
DiT forward / sampling chain against the full-precision model."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import osu_diffusion_tpu.ops.pallas_quant as pq
from osu_diffusion_tpu import CONTEXT_SIZE
from osu_diffusion_tpu.models import DiT_models
from osu_diffusion_tpu.models.dit import DiT, DiTConfig
from osu_diffusion_tpu.models.quantize import quantize_params


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    orig = pq.pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pq.pl, "pallas_call", patched)


@pytest.mark.parametrize("r,k,m", [
    (256, 768, 2304),  # qkv shape
    (2, 64, 384),      # tiny-row adaLN shape (row padding path)
    (100, 64, 96),     # ragged rows, non-128 M (single-block fallback)
])
def test_int8_matmul_matches_dequant_reference(r, k, m):
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(k, m)) * 0.02, jnp.float32)
    x = jnp.asarray(rng.normal(size=(r, k)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(m,)) * 0.1, jnp.float32)
    wq, s = pq.quantize_weight(w)
    ref = x @ (wq.astype(jnp.float32) * s[None, :]) + b
    out = pq.int8_matmul(x, wq, s, b)
    assert out.shape == (r, m)
    err = float(jnp.max(jnp.abs(out - ref))) / float(jnp.max(jnp.abs(ref)))
    assert err < 5e-3  # bf16 MXU dot vs f32 reference


def test_int8_matmul_gelu_epilogue_and_lead_dims():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(64, 128)) * 0.05, jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, 16, 64)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(128,)) * 0.1, jnp.float32)
    wq, s = pq.quantize_weight(w)
    ref = nn.gelu(
        x @ (wq.astype(jnp.float32) * s[None, :]) + b, approximate=True
    )
    out = pq.int8_matmul(x, wq, s, b, activation="gelu_tanh")
    assert out.shape == (2, 16, 128)
    assert float(jnp.max(jnp.abs(out - ref))) < 2e-2


def test_adaln_mlp_quant_matches_dequant_reference():
    from osu_diffusion_tpu.ops.pallas_mlp import _reference_impl, adaln_mlp_quant

    rng = np.random.default_rng(3)
    n, t, d, h = 2, 32, 64, 256
    x = jnp.asarray(rng.normal(size=(n, t, d)), jnp.float32)
    shift = jnp.asarray(rng.normal(size=(n, d)) * 0.1, jnp.float32)
    scale = jnp.asarray(rng.normal(size=(n, d)) * 0.1, jnp.float32)
    gate = jnp.asarray(rng.normal(size=(n, d)) * 0.5, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(d, h)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(h,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(h, d)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(d,)) * 0.1, jnp.float32)
    w1q, s1 = pq.quantize_weight(w1)
    w2q, s2 = pq.quantize_weight(w2)
    # _reference_impl broadcasts the (N, D) modulation vectors itself
    ref = _reference_impl(
        x, shift, scale, gate,
        w1q.astype(jnp.float32) * s1[None, :], b1,
        w2q.astype(jnp.float32) * s2[None, :], b2, eps=1e-6,
    )
    got = adaln_mlp_quant(x, shift, scale, gate, w1q, s1, b1, w2q, s2, b2)
    assert got.shape == (n, t, d)
    err = float(jnp.max(jnp.abs(got - ref))) / float(jnp.max(jnp.abs(ref)))
    assert err < 5e-3, err  # bf16 MXU dots vs f32 reference


def test_adaln_mlp_quant_multi_hblock_accumulation():
    # h=2048 -> block_h=1024 -> 2 H blocks: exercises the cross-block fc2
    # accumulation with per-block dequant scales
    from osu_diffusion_tpu.ops.pallas_mlp import _reference_impl, adaln_mlp_quant

    rng = np.random.default_rng(5)
    n, t, d, h = 2, 16, 128, 2048
    x = jnp.asarray(rng.normal(size=(n, t, d)), jnp.float32)
    shift = jnp.asarray(rng.normal(size=(n, d)) * 0.1, jnp.float32)
    scale = jnp.asarray(rng.normal(size=(n, d)) * 0.1, jnp.float32)
    gate = jnp.asarray(rng.normal(size=(n, d)) * 0.5, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(d, h)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(h,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(h, d)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(d,)) * 0.1, jnp.float32)
    w1q, s1 = pq.quantize_weight(w1)
    w2q, s2 = pq.quantize_weight(w2)
    ref = _reference_impl(
        x, shift, scale, gate,
        w1q.astype(jnp.float32) * s1[None, :], b1,
        w2q.astype(jnp.float32) * s2[None, :], b2, eps=1e-6,
    )
    got = adaln_mlp_quant(x, shift, scale, gate, w1q, s1, b1, w2q, s2, b2)
    err = float(jnp.max(jnp.abs(got - ref))) / float(jnp.max(jnp.abs(ref)))
    assert err < 5e-3, err


def test_int8_modulated_matmul_multi_mblock():
    # m=1536 -> bm=768 -> 2 M blocks: per-block scale/bias slicing
    rng = np.random.default_rng(6)
    n, t, d, m = 2, 16, 128, 1536
    x = jnp.asarray(rng.normal(size=(n, t, d)), jnp.float32)
    shift = jnp.asarray(rng.normal(size=(n, d)) * 0.1, jnp.float32)
    scale = jnp.asarray(rng.normal(size=(n, d)) * 0.1, jnp.float32)
    w = jnp.asarray(rng.normal(size=(d, m)) * 0.02, jnp.float32)
    b = jnp.asarray(rng.normal(size=(m,)) * 0.1, jnp.float32)
    wq, s = pq.quantize_weight(w)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = xc * jax.lax.rsqrt(var + 1e-6)
    h = xn * (1.0 + scale[:, None, :]) + shift[:, None, :]
    ref = h @ (wq.astype(jnp.float32) * s[None, :]) + b
    got = pq.int8_modulated_matmul(x, shift, scale, wq, s, b)
    err = float(jnp.max(jnp.abs(got - ref))) / float(jnp.max(jnp.abs(ref)))
    assert err < 5e-3, err


@pytest.mark.parametrize("d", [1024, 1152])  # DiT-L / DiT-XL widths: bm < d
def test_int8_out_residual_blocked_gate(d):
    # regression: the out-projection kernel must slice the gate per output
    # block — DiT-L (bm=512) and DiT-XL (bm=384) have m // bm > 1
    rng = np.random.default_rng(4)
    n, t = 2, 16
    o = jnp.asarray(rng.normal(size=(n, t, d)), jnp.float32)
    res = jnp.asarray(rng.normal(size=(n, t, d)), jnp.float32)
    gate = jnp.asarray(rng.normal(size=(n, d)) * 0.5, jnp.float32)
    w = jnp.asarray(rng.normal(size=(d, d)) * 0.02, jnp.float32)
    b = jnp.asarray(rng.normal(size=(d,)) * 0.1, jnp.float32)
    wq, s = pq.quantize_weight(w)
    ref = res + gate[:, None, :] * (
        o @ (wq.astype(jnp.float32) * s[None, :]) + b
    )
    got = pq.int8_out_residual(o, res, gate, wq, s, b)
    err = float(jnp.max(jnp.abs(got - ref))) / float(jnp.max(jnp.abs(ref)))
    assert err < 5e-3, err


def test_quantize_weight_roundtrip_bound():
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(size=(64, 32)), jnp.float32)
    wq, s = pq.quantize_weight(w)
    assert wq.dtype == jnp.int8 and s.shape == (32,)
    # symmetric absmax: per-element error <= scale/2, scale = absmax/127
    err = jnp.abs(wq.astype(jnp.float32) * s[None, :] - w)
    assert bool(jnp.all(err <= s[None, :] * 0.5 + 1e-7))
    # stacked (scan layout) leading depth axis
    w3 = jnp.stack([w, 2 * w])
    wq3, s3 = pq.quantize_weight(w3)
    assert wq3.shape == (2, 64, 32) and s3.shape == (2, 32)
    np.testing.assert_allclose(np.asarray(s3[1]), 2 * np.asarray(s3[0]), rtol=1e-6)


def _tiny(num_classes=10, **kw):
    return DiT(
        DiTConfig(
            hidden_size=64, depth=2, num_heads=2, num_classes=num_classes,
            context_size=CONTEXT_SIZE, **kw,
        )
    )


def _randomized_params(model, n=2, t=32, seed=7):
    args = (
        jnp.zeros((n, t, 2)), jnp.zeros((n,), jnp.int32), jnp.zeros((n, t)),
        jnp.zeros((n, t, CONTEXT_SIZE)), jnp.zeros((n,), jnp.int32),
    )
    params = model.init(jax.random.PRNGKey(0), *args)["params"]
    # adaLN-Zero init makes every block an identity — perturb the whole tree
    # so the quantized projections actually carry signal
    leaves, tdef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    return jax.tree.unflatten(
        tdef,
        [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
         for l, k in zip(leaves, keys)],
    )


def _inputs(n=2, t=32):
    x = jax.random.normal(jax.random.PRNGKey(1), (n, t, 2))
    o = jnp.cumsum(jnp.ones((n, t)) * 150, axis=1)
    c = jax.random.normal(jax.random.PRNGKey(2), (n, t, CONTEXT_SIZE))
    y = jnp.asarray([1, 2], jnp.int32)
    tt = jnp.asarray([500, 100], jnp.int32)
    return x, tt, o, c, y


def test_quant_forward_close_to_f32():
    model = _tiny()
    qmodel = _tiny(quant=True)
    params = _randomized_params(model)
    qparams = quantize_params(params)
    x, tt, o, c, y = _inputs()
    ref = model.apply({"params": params}, x, tt, o, c, y)
    got = qmodel.apply({"params": qparams}, x, tt, o, c, y)
    rel = float(jnp.max(jnp.abs(got - ref))) / float(jnp.max(jnp.abs(ref)))
    assert rel < 5e-2, rel


def test_quant_tree_matches_quant_model_structure():
    import jax.tree_util as jtu

    model = _tiny()
    qmodel = _tiny(quant=True)
    params = _randomized_params(model)
    qparams = quantize_params(params)
    args = (
        jnp.zeros((2, 32, 2)), jnp.zeros((2,), jnp.int32), jnp.zeros((2, 32)),
        jnp.zeros((2, 32, CONTEXT_SIZE)), jnp.zeros((2,), jnp.int32),
    )
    qinit = qmodel.init(jax.random.PRNGKey(0), *args)["params"]
    want = {
        jtu.keystr(k): (v.shape, v.dtype)
        for k, v in jtu.tree_leaves_with_path(qinit)
    }
    got = {
        jtu.keystr(k): (v.shape, v.dtype)
        for k, v in jtu.tree_leaves_with_path(qparams)
    }
    assert want == got


def test_quant_scan_layout_agrees_with_unrolled():
    from osu_diffusion_tpu.train.checkpoint import convert_block_layout

    model = _tiny()
    params = _randomized_params(model)
    x, tt, o, c, y = _inputs()
    got_u = _tiny(quant=True).apply(
        {"params": quantize_params(params)}, x, tt, o, c, y
    )
    got_s = _tiny(quant=True, scan_blocks=True).apply(
        {"params": quantize_params(convert_block_layout(params, to_scan=True))},
        x, tt, o, c, y,
    )
    np.testing.assert_allclose(
        np.asarray(got_u), np.asarray(got_s), rtol=0, atol=2e-2
    )


def test_quant_sampler_chain_close_to_f32():
    from osu_diffusion_tpu.diffusion import create_diffusion
    from osu_diffusion_tpu.sampling import Sampler, prepare_cfg_inputs

    model = _tiny()
    qmodel = _tiny(quant=True)
    params = _randomized_params(model)
    qparams = quantize_params(params)
    diffusion = create_diffusion("4", noise_schedule="squaredcos_cap_v2")
    t = 32
    seq_o = np.cumsum(np.full((t,), 150.0))
    seq_c = np.random.default_rng(0).normal(size=(t, CONTEXT_SIZE)).astype(np.float32)
    seq_x = np.zeros((t, 2), np.float32)
    z, o, c, y = prepare_cfg_inputs(
        seq_x, seq_o, seq_c, [1], 10, jax.random.PRNGKey(3)
    )
    ref = Sampler(model, diffusion, cfg_scale=1.5, bucket=t)(
        params, z, o, c, y, jax.random.PRNGKey(4)
    )
    got = Sampler(qmodel, diffusion, cfg_scale=1.5, bucket=t)(
        qparams, z, o, c, y, jax.random.PRNGKey(4)
    )
    assert np.all(np.isfinite(np.asarray(got)))
    # same noise, same chain; int8 weight rounding perturbs the trajectory
    # but the clamped coordinate outputs stay close
    assert float(jnp.max(jnp.abs(got - ref))) < 0.35


def test_quant_composes_with_banded_flash_attention(monkeypatch):
    # int8 projections + the banded flash Pallas core in one forward: the
    # quant kernels feed q/k/v into the flash kernel unchanged
    import osu_diffusion_tpu.ops.pallas_attention as pa

    orig = pa.pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pa.pl, "pallas_call", patched)

    qmodel = _tiny(quant=True)
    qparams = quantize_params(_randomized_params(_tiny()))
    x, tt, o, c, y = _inputs()
    dense = qmodel.apply(
        {"params": qparams}, x, tt, o, c, y, band=8, use_pallas=False
    )
    flash = qmodel.apply(
        {"params": qparams}, x, tt, o, c, y, band=8, use_pallas=True
    )
    np.testing.assert_allclose(
        np.asarray(flash), np.asarray(dense), rtol=0, atol=2e-2
    )


def test_quant_composes_with_delta_cache():
    # quant + Δ-cache accelerated sampling (sample.py --quantize-weights
    # --accel-interval k): the quant blocks run inside the recorded span too
    from osu_diffusion_tpu.diffusion import create_diffusion
    from osu_diffusion_tpu.sampling import Sampler, prepare_cfg_inputs

    qmodel = _tiny(quant=True)
    qparams = quantize_params(_randomized_params(_tiny()))
    diffusion = create_diffusion("6", noise_schedule="squaredcos_cap_v2")
    t = 32
    seq_o = np.cumsum(np.full((t,), 150.0))
    seq_c = np.random.default_rng(0).normal(size=(t, CONTEXT_SIZE)).astype(np.float32)
    z, o, c, y = prepare_cfg_inputs(
        np.zeros((t, 2), np.float32), seq_o, seq_c, [1], 10, jax.random.PRNGKey(3)
    )
    exact = Sampler(qmodel, diffusion, cfg_scale=1.5, bucket=t)(
        qparams, z, o, c, y, jax.random.PRNGKey(4)
    )
    accel = Sampler(qmodel, diffusion, cfg_scale=1.5, bucket=t, accel_interval=3)(
        qparams, z, o, c, y, jax.random.PRNGKey(4)
    )
    assert np.all(np.isfinite(np.asarray(accel)))
    # same noise; the Δ-reuse perturbs the chain but not wildly
    assert float(jnp.max(jnp.abs(accel - exact))) < 1.0


def test_quant_rejects_einsum_layout():
    model = _tiny(quant=True, attn_layout="einsum")
    x, tt, o, c, y = _inputs()
    with pytest.raises(ValueError, match="packed"):
        model.init(jax.random.PRNGKey(0), x, tt, o, c, y)


def test_sample_cli_quantize_weights_with_accel(tmp_path, monkeypatch):
    # the fastest serving config: --quantize-weights --accel-interval
    # together through the real CLI (PARITY "speed-quality frontier")
    torch = pytest.importorskip("torch")
    import os

    from osu_diffusion_tpu.cli import build_sample_parser, sample_main
    from osu_diffusion_tpu.train.checkpoint import params_to_torch_state_dict

    def tiny(**kw):
        return DiT(DiTConfig(hidden_size=32, depth=3, num_heads=2, **kw))

    monkeypatch.setitem(DiT_models, "DiT-T3", tiny)
    model = DiT_models["DiT-T3"](num_classes=52670, context_size=CONTEXT_SIZE)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 2)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 8)), jnp.zeros((1, 8, CONTEXT_SIZE)),
        jnp.zeros((1,), jnp.int32),
    )["params"]
    sd = {
        k: torch.from_numpy(np.array(v, copy=True))
        for k, v in params_to_torch_state_dict(params, num_label_rows=52671).items()
    }
    ckpt = str(tmp_path / "tiny3.pt")
    torch.save({"ema": sd}, ckpt)

    assets = os.path.join(os.path.dirname(__file__), "..", "assets", "toy_datasets")
    beatmap = os.path.join(assets, "geometry", "test - geometry (OliBomby) [test0].osu")
    args = build_sample_parser().parse_args([
        "--beatmap", beatmap,
        "--ckpt", ckpt,
        "--model", "DiT-T3",
        "--num-sampling-steps", "3",
        "--quantize-weights",
        "--accel-interval", "3",
        "--no-use-pallas",
        "--results-dir", str(tmp_path / "results"),
    ])
    written = sample_main(args)
    assert written and all(os.path.exists(p) for p in written)


def test_sample_cli_quantize_weights(tmp_path, monkeypatch):
    torch = pytest.importorskip("torch")
    import os

    from osu_diffusion_tpu.cli import build_sample_parser, sample_main
    from osu_diffusion_tpu.train.checkpoint import params_to_torch_state_dict

    def tiny(**kw):
        return DiT(DiTConfig(hidden_size=32, depth=1, num_heads=2, **kw))

    monkeypatch.setitem(DiT_models, "DiT-T", tiny)
    model = DiT_models["DiT-T"](num_classes=52670, context_size=CONTEXT_SIZE)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 2)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 8)), jnp.zeros((1, 8, CONTEXT_SIZE)),
        jnp.zeros((1,), jnp.int32),
    )["params"]
    sd = {
        k: torch.from_numpy(np.array(v, copy=True))
        for k, v in params_to_torch_state_dict(params, num_label_rows=52671).items()
    }
    ckpt = str(tmp_path / "tiny.pt")
    torch.save({"ema": sd}, ckpt)

    assets = os.path.join(os.path.dirname(__file__), "..", "assets", "toy_datasets")
    beatmap = os.path.join(assets, "geometry", "test - geometry (OliBomby) [test0].osu")
    args = build_sample_parser().parse_args([
        "--beatmap", beatmap,
        "--ckpt", ckpt,
        "--model", "DiT-T",
        "--num-sampling-steps", "2",
        "--quantize-weights",
        "--no-use-pallas",
        "--results-dir", str(tmp_path / "results"),
    ])
    written = sample_main(args)
    assert written and all(os.path.exists(p) for p in written)
