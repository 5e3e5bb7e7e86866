"""Native C++ featurizer: differential tests against the pure-Python path over
all toy fixtures (builds the library on demand; skips without a compiler)."""
import glob
import os
import shutil
import subprocess

import numpy as np
import pytest

from osu_diffusion_tpu.beatmap import Beatmap
from osu_diffusion_tpu.data.featurize import beatmap_to_sequence

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets", "toy_datasets")
ALL_FIXTURES = sorted(glob.glob(os.path.join(ASSETS, "**", "*.osu"), recursive=True))


@pytest.fixture(scope="module")
def native():
    from osu_diffusion_tpu import native as native_mod

    if not native_mod.available():
        if shutil.which("g++") is None:
            pytest.skip("no g++ available to build the native library")
        from osu_diffusion_tpu.native.build import build

        build(verbose=False)
        native_mod._LIB_TRIED = False  # retry load
        assert native_mod.available()
    return native_mod


def test_native_matches_python_on_all_fixtures(native):
    worst = 0.0
    for path in ALL_FIXTURES:
        got = native.featurize_file(path)
        want = beatmap_to_sequence(Beatmap.from_path(path))
        assert got.shape == want.shape, path
        if got.size:
            worst = max(worst, float(np.abs(got - want).max()))
    # double-precision curve math vs float32 rows: sub-millipixel agreement
    assert worst < 2e-3, worst


def test_native_featurize_text(native):
    text = open(os.path.join(ASSETS, "kimi_no_bouken.osu"), encoding="utf-8").read()
    got = native.featurize_text(text)
    want = native.featurize_file(os.path.join(ASSETS, "kimi_no_bouken.osu"))
    np.testing.assert_array_equal(got, want)


def test_native_empty_input(native):
    out = native.featurize_text("osu file format v14\n")
    assert out.shape == (0, 19)


def test_loader_uses_native_and_fallback_agrees(native, monkeypatch):
    import random

    from osu_diffusion_tpu.data.dataset import BeatmapDatasetIterable

    kimi = os.path.join(ASSETS, "kimi_no_bouken.osu")
    it_native = BeatmapDatasetIterable([kimi], 64, 64, rng=random.Random(0))
    (win_n, prev_n), _ = next(it_native)

    monkeypatch.setenv("OSU_DIFFUSION_NO_NATIVE", "1")
    it_py = BeatmapDatasetIterable([kimi], 64, 64, rng=random.Random(0))
    (win_p, prev_p), _ = next(it_py)

    np.testing.assert_allclose(win_n, win_p, atol=2e-3)
    np.testing.assert_allclose(prev_n, prev_p, atol=2e-3)
