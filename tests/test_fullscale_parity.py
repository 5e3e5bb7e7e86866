"""Converter + model parity at REAL DiT-B scale (hidden 768, depth 12,
52,670 classes), the shape of the released reference checkpoint
(DiT-B-0700000.pt, reference README.md:44).

The small-model golden tests (test_model.py, test_sampling_parity.py) validate
the math; this validates the converter at full scale — in particular the
52,671-row label table and its padding to 52,672 (multiple of 16 for
vocab-parallel TP) — and a CFG forward with the banded attention mask at
T=128 against the reference torch model (sample.py:82-84 semantics).
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REFERENCE_DIR = os.environ.get("OSU_DIFFUSION_REFERENCE", "/root/reference")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_DIR), reason="reference checkout not available"
)

CTX = 144
NUM_CLASSES = 52670


def _load_reference():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REFERENCE_DIR)
    try:
        import importlib

        ref_models = importlib.import_module("models")
    finally:
        sys.path.remove(REFERENCE_DIR)
    return torch, ref_models


@pytest.fixture(scope="module")
def dit_b_pair():
    """Reference torch DiT-B + converted flax params (module-scoped: the
    170M-param build is the expensive part)."""
    torch, ref_models = _load_reference()
    from osu_diffusion_tpu.models import DiT_models
    from osu_diffusion_tpu.train.checkpoint import torch_state_dict_to_params

    torch.manual_seed(0)
    ref = ref_models.DiT_models["DiT-B"](
        num_classes=NUM_CLASSES, context_size=CTX, class_dropout_prob=0.2
    )
    ref.eval()
    # adaLN-Zero init makes every block an identity map; add noise so all
    # 12 blocks and the final head contribute to the output
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if "adaLN" in name or "final_layer.linear" in name:
                p.add_(torch.randn_like(p) * 0.02)

    model = DiT_models["DiT-B"](num_classes=NUM_CLASSES, context_size=CTX)
    params = torch_state_dict_to_params(ref.state_dict())
    return torch, ref, model, params


def test_table_padding_boundary(dit_b_pair):
    """52,671 logical rows (num_classes + null) -> 52,672 padded; converting
    back slices the pad row off and round-trips bit-exactly."""
    torch, ref, model, params = dit_b_pair
    from osu_diffusion_tpu.train.checkpoint import (
        params_to_torch_state_dict,
        torch_state_dict_to_params,
    )

    table = np.asarray(params["y_embedder"]["embedding_table"]["embedding"])
    assert table.shape[0] == 52672  # 52671 padded up to a multiple of 16
    assert (table[52671] == 0).all()  # pad row zero, never indexed

    sd = params_to_torch_state_dict(params, num_label_rows=NUM_CLASSES + 1)
    assert sd["y_embedder.embedding_table.weight"].shape[0] == 52671
    rt = torch_state_dict_to_params(sd)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        rt, params,
    )
    # and the torch layout matches the reference model's own state_dict keys
    ref_keys = set(ref.state_dict().keys())
    assert set(sd.keys()) == ref_keys


def test_dit_b_cfg_banded_forward_parity(dit_b_pair):
    """forward_with_cfg at T=128 with the banded mask: converted flax DiT-B
    matches the torch reference within fp32 tolerance."""
    torch, ref, model, params = dit_b_pair
    from osu_diffusion_tpu.models.dit import DiT
    from osu_diffusion_tpu.ops.attention import banded_attention_mask

    n, t_len, band = 1, 128, 32
    r = np.random.RandomState(7)
    x_half = r.randn(n, 2, t_len).astype(np.float32)
    x = np.concatenate([x_half, x_half], axis=0)
    o = np.tile((np.cumsum(r.rand(1, t_len), axis=1) * 300).astype(np.float32),
                (2 * n, 1))
    c = np.tile(r.rand(1, CTX, t_len).astype(np.float32), (2 * n, 1, 1))
    # labels exercise the table tail: the last real class and the null class
    y = np.array([NUM_CLASSES - 1, NUM_CLASSES], dtype=np.int64)
    ts = np.array([500, 500], dtype=np.int64)
    cfg_scale = 2.0

    # reference banded mask: True = BLOCKED (sample.py:82-84)
    tmask = torch.full((t_len, t_len), True)
    for i in range(t_len):
        tmask[max(0, i - band): min(t_len, i + band), i] = False

    with torch.no_grad():
        ref_out = ref.forward_with_cfg(
            torch.from_numpy(x), torch.from_numpy(ts), torch.from_numpy(o),
            torch.from_numpy(c), torch.from_numpy(y), cfg_scale,
            attn_mask=tmask,
        ).numpy()

    got = model.apply(
        {"params": params},
        jnp.asarray(np.swapaxes(x, 1, 2)), jnp.asarray(ts), jnp.asarray(o),
        jnp.asarray(np.swapaxes(c, 1, 2)), jnp.asarray(y),
        cfg_scale=cfg_scale,
        attn_mask=banded_attention_mask(t_len, band),
        method=DiT.forward_with_cfg,
    )
    got = np.swapaxes(np.asarray(got), 1, 2)
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, ref_out, rtol=2e-4, atol=2e-4)
