"""Beatmap I/O tests over the reference's 63 toy fixtures (plain-text gold data,
reused verbatim per SURVEY.md §4)."""
import glob
import os
from datetime import timedelta

import numpy as np
import pytest

from osu_diffusion_tpu.beatmap import Beatmap, Circle, Slider, Spinner
from osu_diffusion_tpu.beatmap.curves import SliderPath
from osu_diffusion_tpu.beatmap.parser import parse_beatmap
from osu_diffusion_tpu.beatmap.writer import render_beatmap

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets", "toy_datasets")
ALL_FIXTURES = sorted(glob.glob(os.path.join(ASSETS, "**", "*.osu"), recursive=True))
KIMI = os.path.join(ASSETS, "kimi_no_bouken.osu")


def test_fixture_inventory():
    assert len(ALL_FIXTURES) == 63


def test_parse_kimi_metadata():
    bm = Beatmap.from_path(KIMI)
    assert bm.title == "Kimi no Bouken (TV Size)"
    assert bm.artist == "Okazaki Taiiku"
    assert bm.beatmap_id == 1828346
    assert bm.slider_multiplier == pytest.approx(1.8)
    assert bm.format_version == 14


def test_parse_kimi_objects_and_timing():
    bm = Beatmap.from_path(KIMI)
    hos = bm.hit_objects(stacking=False)
    assert len(hos) == 395
    assert isinstance(hos[0], Circle) and hos[0].new_combo
    assert hos[0].position.x == 120 and hos[0].position.y == 237
    # uninherited + inherited timing points
    reds = [tp for tp in bm.timing_points if tp.parent is None]
    greens = [tp for tp in bm.timing_points if tp.parent is not None]
    assert len(reds) >= 1 and len(greens) > 100
    assert reds[0].ms_per_beat == pytest.approx(300.0)
    # inherited SV: -100 => 1.0x, -175.43... => ~0.57x
    tp = bm.timing_point_at(timedelta(milliseconds=4700))
    assert tp.sv_multiplier == pytest.approx(100 / 175.438596491228, rel=1e-9)


def test_slider_end_time_from_sv():
    bm = Beatmap.from_path(KIMI)
    sliders = [h for h in bm.hit_objects() if isinstance(h, Slider)]
    s = sliders[0]
    # length 180 @ 1.8 global SV, -100 green (1.0x), 300ms/beat:
    # velocity = 180 px/beat -> 1 beat = 300 ms per span, 1 span
    assert (s.end_time - s.time).total_seconds() * 1000 == pytest.approx(300.0, abs=0.5)


def test_curve_end_position_trimmed_to_length():
    bm = Beatmap.from_path(KIMI)
    s = [h for h in bm.hit_objects() if isinstance(h, Slider)][0]
    end = s.curve(1)
    # path B|433:341|433:341|433:220 from (392,384), pixel length 180:
    # 59.4 px to the red anchor + 120.6 px down = y = 341 - 120.6
    assert end.x == pytest.approx(433.0)
    assert end.y == pytest.approx(341 - (180 - np.hypot(41, 43)), abs=1e-6)


@pytest.mark.parametrize("path", ALL_FIXTURES)
def test_round_trip_all_fixtures(path):
    bm = Beatmap.from_path(path)
    bm2 = parse_beatmap(render_beatmap(bm))
    hos, hos2 = bm.hit_objects(), bm2.hit_objects()
    assert len(hos) == len(hos2)
    for a, b in zip(hos, hos2):
        assert type(a) is type(b)
        assert abs((a.time - b.time).total_seconds()) < 2e-3
        assert a.new_combo == b.new_combo
        if isinstance(a, Slider):
            assert a.repeat == b.repeat
            assert abs((a.end_time - b.end_time).total_seconds()) < 5e-3


def test_spinner_parse():
    # synthesize a minimal beatmap with a spinner
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
    (sp,) = bm.hit_objects()
    assert isinstance(sp, Spinner)
    assert sp.new_combo
    assert sp.end_time == timedelta(milliseconds=3000)


def test_slider_path_perfect_circle():
    # quarter arc through 3 points on the unit circle, radius 100
    pts = np.array([[100.0, 0.0], [70.710678, 70.710678], [0.0, 100.0]])
    p = SliderPath("PerfectCurve", pts)
    # arc length of a half... the arc from (100,0) to (0,100) through 45deg = quarter circle
    assert p.get_distance() == pytest.approx(np.pi / 2 * 100, rel=1e-3)
    mid = p.position_at(0.5)
    np.testing.assert_allclose(mid, [70.710678, 70.710678], atol=0.5)


def test_slider_path_linear_trim_extend():
    pts = np.array([[0.0, 0.0], [100.0, 0.0]])
    trimmed = SliderPath("Linear", pts, expected_distance=50.0)
    np.testing.assert_allclose(trimmed.position_at(1.0), [50.0, 0.0])
    extended = SliderPath("Linear", pts, expected_distance=150.0)
    np.testing.assert_allclose(extended.position_at(1.0), [150.0, 0.0])
    assert extended.get_distance() == pytest.approx(150.0)


def test_slider_path_bezier_red_anchor_split():
    # duplicated anchor splits the bezier into two linear-ish spans
    pts = np.array([[0.0, 0.0], [50.0, 0.0], [50.0, 0.0], [50.0, 50.0]])
    p = SliderPath("Bezier", pts)
    assert p.get_distance() == pytest.approx(100.0, rel=1e-6)
    np.testing.assert_allclose(p.position_at(0.5), [50.0, 0.0], atol=1e-6)


def test_catmull_detail():
    pts = np.array([[0.0, 0.0], [100.0, 0.0]])
    p = SliderPath("Catmull", pts)
    assert p.get_distance() == pytest.approx(100.0, rel=1e-6)
