"""Tests for the window-128 dataset padding helpers in tools/longrun_toy.py —
load-bearing for the reference-protocol learning results (PARITY.md round-3
table): a padding bug would silently train on corrupted fixtures."""
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from longrun_toy import build_dataset  # noqa: E402

from osu_diffusion_tpu.beatmap import Beatmap
from osu_diffusion_tpu.data.featurize import beatmap_to_sequence

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets", "toy_datasets")


def test_padded_dataset_invariants(tmp_path):
    n = build_dataset(str(tmp_path / "ds"), ASSETS, pad_rows=160)
    assert n == 63
    files = sorted(glob.glob(str(tmp_path / "ds" / "Track*" / "beatmaps" / "*")))
    assert len(files) == 63
    rows = []
    for f in files:
        seq = beatmap_to_sequence(Beatmap.from_path(f))
        rows.append(seq.shape[0])
        # time stays monotone across the filler/pattern seam (this catches
        # the SliderMultiplier mismatch bug: tail sliders governed by the
        # fixture's multiplier overran the next object's time)
        assert (np.diff(seq[:, 2]) >= -1e-4).all(), f
    assert min(rows) >= 160  # every file now yields window-128 training data


def test_padding_preserves_fixture_rows(tmp_path):
    """The pattern's featurized rows are bit-preserved under padding: same
    coordinates and types, times shifted by one constant."""
    build_dataset(str(tmp_path / "ds"), ASSETS, pad_rows=160)
    padded = glob.glob(str(tmp_path / "ds" / "Track*" / "beatmaps" / "*"))
    for suite in ("geometry", "symmetry"):
        for raw in sorted(glob.glob(os.path.join(ASSETS, suite, "*.osu")))[:3]:
            rseq = beatmap_to_sequence(Beatmap.from_path(raw))
            base = os.path.basename(raw)
            match = [p for p in padded if p.endswith(base)]
            assert len(match) == 1, base
            pseq = beatmap_to_sequence(Beatmap.from_path(match[0]))
            tail = pseq[-rseq.shape[0]:]
            np.testing.assert_allclose(tail[:, :2], rseq[:, :2], atol=1e-3)
            np.testing.assert_allclose(tail[:, 3:], rseq[:, 3:], atol=1e-6)
            dt = tail[:, 2] - rseq[:, 2]
            # constant shift up to the writer's integer-ms rounding
            assert np.allclose(dt, dt[0], atol=1.5), (base, dt.min(), dt.max())


def test_long_fixture_copied_verbatim(tmp_path):
    """Files already >= pad_rows (the filler itself) are copied, not padded."""
    build_dataset(str(tmp_path / "ds"), ASSETS, pad_rows=160)
    kimi = [p for p in glob.glob(str(tmp_path / "ds" / "Track*" / "beatmaps" / "*"))
            if p.endswith("kimi_no_bouken.osu")]
    assert len(kimi) == 1
    with open(os.path.join(ASSETS, "kimi_no_bouken.osu"), encoding="utf-8-sig") as f:
        want = f.read()
    with open(kimi[0], encoding="utf-8-sig") as f:
        assert f.read() == want


def test_early_timing_point_fixture_does_not_regovern_tail(tmp_path):
    """A fixture whose red line precedes its first object by more than the
    seam gap must NOT land that red line inside the filler tail after the
    shift (it would re-govern tail sliders and corrupt their durations)."""
    from datetime import timedelta

    from longrun_toy import _kimi_tail, _pad_with_filler

    from osu_diffusion_tpu.beatmap.parser import parse_beatmap
    from osu_diffusion_tpu.beatmap.writer import render_beatmap

    # red line at 0ms with a very slow beat; first object at 5000ms
    fixture = parse_beatmap("""osu file format v14

[Difficulty]
SliderMultiplier:1
SliderTickRate:1

[TimingPoints]
0,2000,4,2,0,100,1

[HitObjects]
100,100,5000,2,0,L|200:100,1,100
300,300,10000,1,0,0:0:0:0:
""")
    tail = _kimi_tail(os.path.join(ASSETS, "kimi_no_bouken.osu"), 160)
    combined = _pad_with_filler(fixture, tail)
    reparsed = parse_beatmap(render_beatmap(combined))
    seq = beatmap_to_sequence(reparsed)
    assert (np.diff(seq[:, 2]) >= -1e-4).all()
    # every fixture timing point sits past the tail's last object
    tail_end = max(
        max(o.time, getattr(o, "end_time", o.time)) for o in tail.hit_objects()
    )
    shifted = reparsed.timing_points[len(combined.timing_points) - 1:]
    # the fixture slider still gets ITS red line: 100px at SM=1, SV=1, beat
    # 2000ms -> span 2000ms (end = start + 2000)
    objs = reparsed.hit_objects()
    slider = objs[-2]
    span = (slider.end_time - slider.time) / timedelta(milliseconds=1)
    assert abs(span - 2000.0) < 1.0, span
