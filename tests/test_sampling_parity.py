"""Full-stack numerical parity: the ENTIRE denoising chain (model + diffusion +
respacing + converter) against the reference torch implementation.

DDIM with eta=0 is deterministic given the initial noise, so identical inputs
must produce near-identical trajectories — this is the north-star
"output-fidelity parity from the same checkpoints" check (BASELINE.json),
skipped when the reference checkout is unavailable."""
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


def _load_reference():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REFERENCE_DIR)
    try:
        import importlib

        ref_models = importlib.import_module("models")
        ref_diffusion = importlib.import_module("diffusion")
    finally:
        sys.path.remove(REFERENCE_DIR)
    return torch, ref_models, ref_diffusion


def test_ddim_chain_parity():
    torch, ref_models, ref_diffusion = _load_reference()
    from osu_diffusion_tpu.diffusion import create_diffusion
    from osu_diffusion_tpu.models.dit import DiT, DiTConfig
    from osu_diffusion_tpu.train.checkpoint import torch_state_dict_to_params

    torch.manual_seed(0)
    ref = ref_models.DiT(
        in_channels=2, context_size=CTX, hidden_size=96, depth=2, num_heads=4,
        class_dropout_prob=0.1, num_classes=7, learn_sigma=True,
    )
    ref.eval()
    # nonzero output weights so the chain actually denoises
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if "adaLN" in name or "final_layer.linear" in name:
                p.add_(torch.randn_like(p) * 0.02)

    steps = 8
    ref_diff = ref_diffusion.create_diffusion(
        str(steps), noise_schedule="squaredcos_cap_v2"
    )

    n, t_len = 2, 16
    r = np.random.RandomState(3)
    z = r.randn(n, 2, t_len).astype(np.float32)
    o = (np.cumsum(r.rand(n, t_len), axis=1) * 300).astype(np.float32)
    c = r.rand(n, CTX, t_len).astype(np.float32)
    y = r.randint(0, 7, (n,)).astype(np.int64)

    with torch.no_grad():
        ref_out = ref_diff.ddim_sample_loop(
            ref.forward,
            (n, 2, t_len),
            noise=torch.from_numpy(z),
            clip_denoised=True,
            model_kwargs=dict(
                o=torch.from_numpy(o), c=torch.from_numpy(c), y=torch.from_numpy(y)
            ),
            device="cpu",
            eta=0.0,
        ).numpy()

    model = DiT(DiTConfig(
        in_channels=2, context_size=CTX, hidden_size=96, depth=2, num_heads=4,
        class_dropout_prob=0.1, num_classes=7, learn_sigma=True,
    ))
    params = {"params": torch_state_dict_to_params(ref.state_dict())}
    diffusion = create_diffusion(str(steps), noise_schedule="squaredcos_cap_v2")

    def model_fn(x, tt, **kw):
        return model.apply(
            params, x, tt, jnp.asarray(o), jnp.asarray(np.swapaxes(c, 1, 2)),
            jnp.asarray(y),
        )

    got = diffusion.ddim_sample_loop(
        model_fn,
        (n, t_len, 2),
        jax.random.PRNGKey(0),  # unused: eta=0 and noise given
        noise=jnp.asarray(np.swapaxes(z, 1, 2)),
        clip_denoised=True,
    )
    got = np.swapaxes(np.asarray(got), 1, 2)
    # 8 chained f32 model evaluations: small per-step error accumulates
    np.testing.assert_allclose(got, ref_out, rtol=1e-3, atol=5e-3)


def test_cfg_ddim_chain_parity():
    """Same, through forward_with_cfg (the sample.py path) with a CFG-doubled
    batch and guidance scale > 1."""
    torch, ref_models, ref_diffusion = _load_reference()
    from osu_diffusion_tpu.diffusion import create_diffusion
    from osu_diffusion_tpu.models.dit import DiT, DiTConfig
    from osu_diffusion_tpu.train.checkpoint import torch_state_dict_to_params

    torch.manual_seed(1)
    ref = ref_models.DiT(
        in_channels=2, context_size=CTX, hidden_size=96, depth=2, num_heads=4,
        class_dropout_prob=0.1, num_classes=7, learn_sigma=True,
    )
    ref.eval()
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if "adaLN" in name or "final_layer.linear" in name:
                p.add_(torch.randn_like(p) * 0.02)

    steps = 6
    ref_diff = ref_diffusion.create_diffusion(
        str(steps), noise_schedule="squaredcos_cap_v2"
    )
    n, t_len = 1, 12
    r = np.random.RandomState(5)
    z_half = r.randn(n, 2, t_len).astype(np.float32)
    z = np.concatenate([z_half, z_half], axis=0)
    o = np.tile((np.cumsum(r.rand(1, t_len), axis=1) * 300).astype(np.float32), (2 * n, 1))
    c = np.tile(r.rand(1, CTX, t_len).astype(np.float32), (2 * n, 1, 1))
    y = np.array([2, 7], dtype=np.int64)  # [cond | null]
    cfg_scale = 3.0

    import functools

    with torch.no_grad():
        ref_out = ref_diff.ddim_sample_loop(
            functools.partial(ref.forward_with_cfg),
            (2 * n, 2, t_len),
            noise=torch.from_numpy(z),
            clip_denoised=True,
            model_kwargs=dict(
                o=torch.from_numpy(o), c=torch.from_numpy(c),
                y=torch.from_numpy(y), cfg_scale=cfg_scale,
            ),
            device="cpu",
            eta=0.0,
        ).numpy()

    model = DiT(DiTConfig(
        in_channels=2, context_size=CTX, hidden_size=96, depth=2, num_heads=4,
        class_dropout_prob=0.1, num_classes=7, learn_sigma=True,
    ))
    params = {"params": torch_state_dict_to_params(ref.state_dict())}
    diffusion = create_diffusion(str(steps), noise_schedule="squaredcos_cap_v2")

    def model_fn(x, tt, **kw):
        return model.apply(
            params, x, tt, jnp.asarray(o), jnp.asarray(np.swapaxes(c, 1, 2)),
            jnp.asarray(y), cfg_scale=cfg_scale,
            method=DiT.forward_with_cfg,
        )

    got = diffusion.ddim_sample_loop(
        model_fn,
        (2 * n, t_len, 2),
        jax.random.PRNGKey(0),
        noise=jnp.asarray(np.swapaxes(z, 1, 2)),
        clip_denoised=True,
    )
    got = np.swapaxes(np.asarray(got), 1, 2)
    np.testing.assert_allclose(got, ref_out, rtol=1e-3, atol=5e-3)
