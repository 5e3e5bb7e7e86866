"""Decoder robustness: random model-like outputs must decode to writable,
re-parsable beatmaps without crashing (the sample CLI wraps create_beatmap in a
try/except per sequence, reference sample.py:116-140 — but the decoder itself
should survive arbitrary type/coordinate patterns)."""
import os

import numpy as np

from osu_diffusion_tpu.beatmap import Beatmap
from osu_diffusion_tpu.beatmap.parser import parse_beatmap
from osu_diffusion_tpu.beatmap.writer import render_beatmap
from osu_diffusion_tpu.export import create_beatmap

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets", "toy_datasets")
KIMI = os.path.join(ASSETS, "kimi_no_bouken.osu")


def _random_seq(rng, t=64):
    seq = np.zeros((t, 19), dtype=np.float32)
    # clamp range matches the sampler's [-1, 2] pred_xstart clamp
    seq[:, 0] = rng.uniform(-1, 2, t)
    seq[:, 1] = rng.uniform(-1, 2, t)
    seq[:, 2] = np.cumsum(rng.uniform(50, 400, t))
    types = rng.integers(0, 16, t)
    seq[np.arange(t), 3 + types] = 1.0
    return seq


def test_decode_random_sequences_never_crash():
    ref = Beatmap.from_path(KIMI)
    rng = np.random.default_rng(0)
    for trial in range(20):
        seq = _random_seq(rng)
        bm = create_beatmap(seq, ref, f"fuzz {trial}")
        text = render_beatmap(bm)
        reparsed = parse_beatmap(text)
        assert reparsed.version == f"fuzz {trial}"


def test_decode_degenerate_sliders():
    """Slider end immediately after head (no anchors/last-anchor rows)."""
    ref = Beatmap.from_path(KIMI)
    t = 4
    seq = np.zeros((t, 19), dtype=np.float32)
    seq[:, 2] = [0, 100, 200, 300]
    seq[0, 3 + 4] = 1   # slider head
    seq[1, 3 + 11] = 1  # slider end (repeat class 0) with no path rows
    seq[2, 3 + 0] = 1   # circle
    seq[3, 3 + 3] = 1   # spinner end with no spinner start
    bm = create_beatmap(seq, ref, "degen")
    render_beatmap(bm)  # must not crash
