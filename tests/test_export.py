"""Export/decode layer tests: featurize -> decode round trip over fixtures
(reference export/create_beatmap.py parity)."""
import os
from datetime import timedelta

import numpy as np
import pytest

from osu_diffusion_tpu.beatmap import Beatmap, Circle, Slider, Spinner
from osu_diffusion_tpu.beatmap.curves import SliderPath
from osu_diffusion_tpu.beatmap.parser import parse_beatmap
from osu_diffusion_tpu.beatmap.writer import render_beatmap
from osu_diffusion_tpu.data import beatmap_to_sequence
from osu_diffusion_tpu.export import create_beatmap, position_to_progress

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets", "toy_datasets")
KIMI = os.path.join(ASSETS, "kimi_no_bouken.osu")


def _normalize(seq):
    out = seq.copy()
    out[:, 0] /= 512.0
    out[:, 1] /= 384.0
    return out


def test_position_to_progress_endpoints():
    path = SliderPath("Linear", np.array([[0.0, 0.0], [100.0, 0.0]]))
    assert position_to_progress(path, np.array([100.0, 0.0])) == pytest.approx(1.0, abs=1e-3)
    assert position_to_progress(path, np.array([50.0, 0.0])) == pytest.approx(0.5, abs=1e-2)


def test_decode_circles_only():
    bm = Beatmap.from_path(
        os.path.join(ASSETS, "geometry", "test - geometry (OliBomby) [test0].osu")
    )
    seq = _normalize(beatmap_to_sequence(bm))
    out = create_beatmap(seq, bm, "decoded")
    in_objs = bm.hit_objects()
    out_objs = out.hit_objects()
    assert len(out_objs) == len(in_objs)
    for a, b in zip(in_objs, out_objs):
        assert type(a) is type(b)
        assert abs(a.position.x - b.position.x) <= 1
        assert abs(a.position.y - b.position.y) <= 1
        assert abs((a.time - b.time).total_seconds()) < 2e-3
    assert out.version == "decoded"
    assert out.title == bm.title


def test_decode_kimi_full_round_trip():
    bm = Beatmap.from_path(KIMI)
    seq = _normalize(beatmap_to_sequence(bm))
    out = create_beatmap(seq, bm, "v2")
    in_objs = bm.hit_objects()
    out_objs = out.hit_objects()
    assert len(out_objs) == len(in_objs)
    n_sliders = 0
    for a, b in zip(in_objs, out_objs):
        assert type(a) is type(b), (a, b)
        assert abs(a.position.x - b.position.x) <= 1
        assert abs(a.position.y - b.position.y) <= 1
        if isinstance(a, Slider):
            n_sliders += 1
            assert b.repeat == a.repeat or a.repeat >= 4
            # recovered pixel length close to the original (rounded coords ->
            # small error; repeat>1 spans fit only the first span)
            assert b.length == pytest.approx(a.length, rel=0.1, abs=6.0)
            assert abs((a.end_time - b.end_time).total_seconds()) < 5e-3
    assert n_sliders > 10
    # decoded map emits one inherited SV timing point per slider
    greens = [tp for tp in out.timing_points if tp.parent is not None]
    assert len(greens) == n_sliders


def test_decoded_beatmap_writes_and_reparses():
    bm = Beatmap.from_path(KIMI)
    seq = _normalize(beatmap_to_sequence(bm))
    out = create_beatmap(seq, bm, "v2")
    reparsed = parse_beatmap(render_beatmap(out))
    assert len(reparsed.hit_objects()) == len(out.hit_objects())
    # slider durations survive the write->parse cycle via the SV timing points
    for a, b in zip(out.hit_objects(), reparsed.hit_objects()):
        if isinstance(a, Slider):
            da = (a.end_time - a.time).total_seconds()
            db = (b.end_time - b.time).total_seconds()
            assert db == pytest.approx(da, rel=0.02, abs=2e-3)


def test_decode_spinner():
    text = """osu file format v14

[General]
AudioFilename: a.mp3

[Difficulty]
SliderMultiplier:1.4

[TimingPoints]
0,500,4,1,0,100,1,0

[HitObjects]
256,192,1000,12,0,3000,0:0:0:0:
"""
    bm = parse_beatmap(text)
    seq = _normalize(beatmap_to_sequence(bm))
    out = create_beatmap(seq, bm, "spin")
    (sp,) = out.hit_objects()
    assert isinstance(sp, Spinner)
    assert sp.end_time == timedelta(milliseconds=3000)
