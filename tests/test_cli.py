"""Sample-CLI end-to-end on CPU: tiny model injected into the registry, real
argument parsing, full parse->featurize->sample->decode->write flow."""
import os
import shutil

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from osu_diffusion_tpu import CONTEXT_SIZE
from osu_diffusion_tpu.models import DiT_models
from osu_diffusion_tpu.models.dit import DiT, DiTConfig

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets", "toy_datasets")


@pytest.fixture()
def tiny_registry(monkeypatch):
    def tiny(**kw):
        return DiT(DiTConfig(hidden_size=32, depth=1, num_heads=2, **kw))

    monkeypatch.setitem(DiT_models, "DiT-T", tiny)
    return "DiT-T"


@pytest.fixture()
def tiny_ckpt(tiny_registry, tmp_path):
    torch = pytest.importorskip("torch")
    from osu_diffusion_tpu.train.checkpoint import params_to_torch_state_dict

    model = DiT_models[tiny_registry](num_classes=52670, context_size=CONTEXT_SIZE)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 2)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 8)), jnp.zeros((1, 8, CONTEXT_SIZE)),
        jnp.zeros((1,), jnp.int32),
    )["params"]
    sd = {
        # np.array(..., copy=True): torch.from_numpy on a non-writable view
        # of a jax array emits a UserWarning (and aliases immutable memory)
        k: torch.from_numpy(np.array(v, copy=True))
        for k, v in params_to_torch_state_dict(params, num_label_rows=52671).items()
    }
    path = str(tmp_path / "tiny.pt")
    torch.save({"ema": sd}, path)
    return path


@pytest.mark.parametrize("method,dtype", [
    ("ancestral", "f32"), ("ddim", "f32"), ("ancestral", "bf16"),
])
def test_sample_cli_end_to_end(tiny_registry, tiny_ckpt, tmp_path, method, dtype):
    from osu_diffusion_tpu.cli import build_sample_parser, sample_main

    # a short fixture keeps the chain fast on CPU
    beatmap = os.path.join(ASSETS, "geometry", "test - geometry (OliBomby) [test0].osu")
    results = str(tmp_path / "results")
    args = build_sample_parser().parse_args([
        "--beatmap", beatmap,
        "--ckpt", tiny_ckpt,
        "--model", tiny_registry,
        "--num-sampling-steps", "3",
        "--results-dir", results,
        "--sampling-method", method,
        "--compute-dtype", dtype,
        "--no-use-pallas",
    ])
    written = sample_main(args)
    assert len(written) == 1
    from osu_diffusion_tpu.beatmap import Beatmap

    out = Beatmap.from_path(written[0])
    ref = Beatmap.from_path(beatmap)
    assert len(out.hit_objects()) == len(ref.hit_objects())
    # rhythm preserved exactly: times match the input skeleton
    for a, b in zip(ref.hit_objects(), out.hit_objects()):
        assert abs((a.time - b.time).total_seconds()) < 2e-3


def test_sample_cli_accel(tiny_registry, tiny_ckpt, tmp_path):
    """Δ-cache accelerated sampling end-to-end: --accel-interval forces the
    unrolled layout, the chain runs the record/apply cond, and the written
    map still matches the input rhythm skeleton."""
    from osu_diffusion_tpu.cli import build_sample_parser, sample_main

    beatmap = os.path.join(ASSETS, "geometry", "test - geometry (OliBomby) [test0].osu")
    results = str(tmp_path / "results")
    args = build_sample_parser().parse_args([
        "--beatmap", beatmap,
        "--ckpt", tiny_ckpt,
        "--model", tiny_registry,
        "--num-sampling-steps", "4",
        "--results-dir", results,
        "--no-use-pallas",
        "--accel-interval", "2",
        "--accel-span", "0", "1",
    ])
    written = sample_main(args)
    assert len(written) == 1
    from osu_diffusion_tpu.beatmap import Beatmap

    out = Beatmap.from_path(written[0])
    ref = Beatmap.from_path(beatmap)
    assert len(out.hit_objects()) == len(ref.hit_objects())


def test_sample_cli_style_id(tiny_registry, tiny_ckpt, tmp_path):
    from osu_diffusion_tpu.cli import build_sample_parser, sample_main

    beatmap = os.path.join(ASSETS, "geometry", "test - geometry (OliBomby) [test0].osu")
    args = build_sample_parser().parse_args([
        "--beatmap", beatmap,
        "--ckpt", tiny_ckpt,
        "--model", tiny_registry,
        "--num-sampling-steps", "2",
        "--results-dir", str(tmp_path / "results"),
        "--style-id", "2116103",  # present in the bundled beatmap_idx.pickle
        "--num-variants", "2",
        "--no-use-pallas",
    ])
    written = sample_main(args)
    assert len(written) == 2  # two style variants


def test_sample_cli_refine_pass(tiny_registry, tiny_ckpt, tmp_path):
    """--refine-ckpt runs the t=0 refine iterations after the main chain and
    writes a second output (parity sample.py:186-205)."""
    from osu_diffusion_tpu.cli import build_sample_parser, sample_main

    beatmap = os.path.join(ASSETS, "geometry", "test - geometry (OliBomby) [test0].osu")
    args = build_sample_parser().parse_args([
        "--beatmap", beatmap,
        "--ckpt", tiny_ckpt,
        "--model", tiny_registry,
        "--num-sampling-steps", "2",
        "--refine-ckpt", tiny_ckpt,
        "--refine-iters", "2",
        "--results-dir", str(tmp_path / "results"),
        "--no-use-pallas",
    ])
    written = sample_main(args)
    # main output + refined output
    assert len(written) == 2
    from osu_diffusion_tpu.beatmap import Beatmap

    for path in written:
        assert Beatmap.from_path(path).hit_objects()


def test_sample_cli_make_animation(tiny_registry, tiny_ckpt, tmp_path):
    """--make-animation renders the denoising chain to a GIF via the
    progressive sampler (parity sample.py:144-172)."""
    import glob as globmod

    from osu_diffusion_tpu.cli import build_sample_parser, sample_main

    beatmap = os.path.join(ASSETS, "geometry", "test - geometry (OliBomby) [test0].osu")
    args = build_sample_parser().parse_args([
        "--beatmap", beatmap,
        "--ckpt", tiny_ckpt,
        "--model", tiny_registry,
        "--num-sampling-steps", "2",
        "--results-dir", str(tmp_path / "results"),
        "--make-animation",
        "--plot-time", "0",
        "--no-use-pallas",
    ])
    written = sample_main(args)
    assert len(written) == 1
    gifs = globmod.glob(str(tmp_path / "results" / "*" / "animation.gif"))
    assert len(gifs) == 1 and os.path.getsize(gifs[0]) > 0


class TestServingRegimeWarnings:
    """Guardrails for the measured fast-flag regime cliffs (PARITY.md,
    round-5 batch-blocked kernels): int8 wins across the whole batch-2 line
    (1.57x..1.04x at T=32..128) and loses only at batched throughput
    (0.93x at dispatch batch 32); Δ-cache intervals >3 stop paying at
    T<=32."""

    def test_int8_long_t_silent(self):
        # T=128 batch 2 measures 1.04x with the batch-blocked kernels —
        # must NOT warn anymore (round-4 guardrail warned here)
        import warnings as _w

        from osu_diffusion_tpu.cli import serving_regime_warnings

        with _w.catch_warnings():
            _w.simplefilter("error")
            assert serving_regime_warnings(True, 1, t_len=128, dispatch_batch=2) == []

    def test_int8_mid_t_silent(self):
        # T=64 measures 1.04x now (was 0.95x with per-batch-row kernels)
        import warnings as _w

        from osu_diffusion_tpu.cli import serving_regime_warnings

        with _w.catch_warnings():
            _w.simplefilter("error")
            assert serving_regime_warnings(True, 1, t_len=64, dispatch_batch=2) == []

    def test_int8_big_batch_warns(self):
        from osu_diffusion_tpu.cli import serving_regime_warnings

        with pytest.warns(RuntimeWarning, match="batch"):
            out = serving_regime_warnings(True, 1, t_len=32, dispatch_batch=32)
        assert len(out) == 1

    def test_int8_home_regime_silent(self):
        import warnings as _w

        from osu_diffusion_tpu.cli import serving_regime_warnings

        with _w.catch_warnings():
            _w.simplefilter("error")
            assert serving_regime_warnings(True, 3, t_len=32, dispatch_batch=2) == []

    def test_accel_deep_interval_short_t_warns(self):
        from osu_diffusion_tpu.cli import serving_regime_warnings

        with pytest.warns(RuntimeWarning, match="accel-interval"):
            out = serving_regime_warnings(False, 5, t_len=32, dispatch_batch=2)
        assert len(out) == 1

    def test_accel_deep_interval_long_t_silent(self):
        import warnings as _w

        from osu_diffusion_tpu.cli import serving_regime_warnings

        with _w.catch_warnings():
            _w.simplefilter("error")
            assert serving_regime_warnings(False, 5, t_len=128, dispatch_batch=2) == []


def test_sample_cli_warns_on_quantize_big_batch(tiny_registry, tiny_ckpt, tmp_path):
    """e2e: --quantize-weights with --num-variants 4 (CFG-doubled dispatch
    batch 8) is in the measured lose regime and must warn."""
    from osu_diffusion_tpu.cli import build_sample_parser, sample_main

    beatmap = os.path.join(ASSETS, "geometry", "test - geometry (OliBomby) [test0].osu")
    args = build_sample_parser().parse_args([
        "--beatmap", beatmap,
        "--ckpt", tiny_ckpt,
        "--model", tiny_registry,
        "--num-sampling-steps", "2",
        "--results-dir", str(tmp_path / "results"),
        "--no-use-pallas",
        "--quantize-weights",
        "--style-id", "2116103",  # present in the bundled beatmap_idx.pickle
        "--num-variants", "4",
    ])
    with pytest.warns(RuntimeWarning, match="quantize-weights"):
        written = sample_main(args)
    assert len(written) == 4
