"""Parser robustness fuzzing: mutated/malformed .osu inputs through BOTH the
Python beatmap parser and the native C++ featurizer.

Real ranked .osu files span format v3-v14 quirks (missing sections, extra
commas, storyboard junk, huge values); the loaders must never crash on them —
the Python path may raise a clean Python exception, the native path may return
a nonzero status (surfaced as RuntimeError), but neither may segfault, hang,
or silently disagree: on every input BOTH paths accept, the feature rows must
match (the native parser transparently replaces the Python one inside loader
workers, so a divergence would silently change training data between machines).

Reference context: the reference leans on the `slider` pip package for this
tolerance (requirements.txt:4); export-side fuzzing lives in
tests/test_export_fuzz.py.
"""
import glob
import os
import random
import shutil

import numpy as np
import pytest

from osu_diffusion_tpu.beatmap import Beatmap
from osu_diffusion_tpu.beatmap.parser import parse_beatmap
from osu_diffusion_tpu.data.featurize import beatmap_to_sequence

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets", "toy_datasets")
SEEDS = sorted(glob.glob(os.path.join(ASSETS, "**", "*.osu"), recursive=True))


@pytest.fixture(scope="module")
def native():
    from osu_diffusion_tpu import native as native_mod

    if not native_mod.available():
        if shutil.which("g++") is None:
            pytest.skip("no g++ available to build the native library")
        from osu_diffusion_tpu.native.build import build

        build(verbose=False)
        native_mod._LIB_TRIED = False
        assert native_mod.available()
    return native_mod


# -- mutation operators ------------------------------------------------------


def _truncate(text: str, rng) -> str:
    return text[: rng.randrange(len(text) + 1)]


def _drop_lines(text: str, rng) -> str:
    lines = text.split("\n")
    keep = [l for l in lines if rng.random() > 0.2]
    return "\n".join(keep)


def _dup_lines(text: str, rng) -> str:
    lines = text.split("\n")
    out = []
    for l in lines:
        out.append(l)
        if rng.random() < 0.1:
            out.append(l)
    return "\n".join(out)


def _junk_lines(text: str, rng) -> str:
    junk = [
        "", ",,,,,", "garbage line with no structure", "[NotASection]",
        "//storyboard comment", "Sprite,Background,Centre,\"bg.png\",320,240",
        "0,0,\"bg.jpg\",0,0", "﻿BOM line", "key without value:",
        ":value without key", "a:b:c:d:e", "    ", "\t\t",
    ]
    lines = text.split("\n")
    for _ in range(rng.randrange(1, 8)):
        lines.insert(rng.randrange(len(lines) + 1), rng.choice(junk))
    return "\n".join(lines)


def _format_version(text: str, rng) -> str:
    v = rng.choice([3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 128, 0, -1])
    lines = text.split("\n")
    if lines and lines[0].startswith("osu file format"):
        lines[0] = f"osu file format v{v}"
    else:
        lines.insert(0, f"osu file format v{v}")
    return "\n".join(lines)


def _mangle_numbers(text: str, rng) -> str:
    repl = rng.choice([
        "999999999", "-1", "0", "nan", "inf", "1e308", "3.5.7", "",
        # shared token-grammar edges: Python float()/int() would accept the
        # first three without the strict-token precheck; the last saturates
        "2_56", "\u0661\u0662\u0663", "+1_0", "18446744073709551616",
    ])
    lines = text.split("\n")
    for i, l in enumerate(lines):
        if "," in l and rng.random() < 0.15:
            parts = l.split(",")
            parts[rng.randrange(len(parts))] = repl
            lines[i] = ",".join(parts)
    return "\n".join(lines)


def _extra_commas(text: str, rng) -> str:
    lines = text.split("\n")
    for i, l in enumerate(lines):
        if "," in l and rng.random() < 0.2:
            lines[i] = l + "," * rng.randrange(1, 4)
    return "\n".join(lines)


def _drop_section(text: str, rng) -> str:
    import re

    sections = re.findall(r"\[(\w+)\]", text)
    if not sections:
        return text
    victim = rng.choice(sections)
    out, skipping = [], False
    for l in text.split("\n"):
        if l.strip().startswith("["):
            skipping = l.strip() == f"[{victim}]"
        if not skipping:
            out.append(l)
    return "\n".join(out)


def _huge_repeats(text: str, rng) -> str:
    # slider lines: x,y,time,type,hitSound,curve,repeats,length
    lines = text.split("\n")
    for i, l in enumerate(lines):
        parts = l.split(",")
        if len(parts) >= 8 and "|" in l and rng.random() < 0.5:
            parts[6] = rng.choice(["10000", "-5", "2147483647"])
            lines[i] = ",".join(parts)
    return "\n".join(lines)


MUTATORS = [
    _truncate, _drop_lines, _dup_lines, _junk_lines, _format_version,
    _mangle_numbers, _extra_commas, _drop_section, _huge_repeats,
]


def _mutants(n_per_seed: int = 6):
    rng = random.Random(0xBEEF)
    for path in SEEDS:
        text = open(path, encoding="utf-8").read()
        for i in range(n_per_seed):
            m = text
            for _ in range(rng.randrange(1, 4)):
                m = rng.choice(MUTATORS)(m, rng)
            yield f"{os.path.basename(path)}#{i}", m


def _python_featurize(text: str):
    bm = parse_beatmap(text)
    return beatmap_to_sequence(bm)


def test_fuzz_no_crash_and_native_python_agree(native):
    compared = 0
    survived_py = survived_cc = 0
    for name, text in _mutants():
        py_out = py_err = None
        try:
            py_out = _python_featurize(text)
            survived_py += 1
        except Exception as e:  # clean Python exception is acceptable
            py_err = e
        try:
            cc_out = native.featurize_text(text)
            survived_cc += 1
        except Exception:
            cc_out = None

        if py_out is not None and cc_out is not None:
            compared += 1
            assert cc_out.shape == py_out.shape, (
                f"{name}: native {cc_out.shape} vs python {py_out.shape}"
            )
            if cc_out.size:
                # both parse in double precision; rows are float32
                np.testing.assert_allclose(
                    cc_out, py_out, rtol=1e-4, atol=2e-3, err_msg=name
                )
    # the suite is only meaningful if a healthy fraction survives mutation
    assert compared > 100, (compared, survived_py, survived_cc)


def test_fuzz_survivability_agreement(native):
    """The native parser replaces the Python one transparently in loader
    workers, so accept/reject decisions must agree — otherwise the training
    set silently differs between machines with and without the library."""
    disagreements = []
    for name, text in _mutants(n_per_seed=3):
        try:
            _python_featurize(text)
            py_ok = True
        except Exception:
            py_ok = False
        try:
            native.featurize_text(text)
            cc_ok = True
        except Exception:
            cc_ok = False
        if py_ok != cc_ok:
            disagreements.append((name, "py" if py_ok else "cc"))
    assert not disagreements, disagreements[:10]


def test_fuzz_pathological_inputs(native):
    """Hand-picked pathological cases: must not crash either path."""
    cases = [
        "",
        "\n" * 1000,
        "osu file format v14",
        "[HitObjects]\n" + "256,192,1000,1,0\n" * 5000,
        "[HitObjects]\n256,192,1000,2,0,B|,-999,",
        "[HitObjects]\n256,192,1000,2,0,B|100:100|200:200,1,1e300",
        "[TimingPoints]\n-28,-100,4,1,0,100,0,0\n[HitObjects]\n0,0,0,1,0",
        "[General]\nMode: 3\n[HitObjects]\n256,192,1000,1,0",
        "osu file format v3\n[HitObjects]\n256,192,1000,12,0,5000",  # v3 spinner
        "[HitObjects]\n256,192,1000,2,0,C|100:100,1,50",  # catmull
        "\x00\x01\x02 binary junk \xff".encode("latin-1").decode("latin-1"),
    ]
    for i, text in enumerate(cases):
        try:
            _python_featurize(text)
        except Exception:
            pass
        try:
            native.featurize_text(text)
        except Exception:
            pass


def test_token_grammar_agreement(native):
    """Grammar edges where Python's float()/int() are laxer than strtod/strtol:
    underscore separators, Unicode digits, and beyond-int64 integers must get
    the SAME accept/reject decision and identical rows from both parsers."""
    base = (
        "osu file format v14\n[TimingPoints]\n0,500,4,1,0,100,1,0\n"
        "[HitObjects]\n{line}\n"
    )
    lines = [
        "2_56,192,1000,1,0",                      # underscore coordinate
        "١٢٣,192,1000,1,0",        # unicode digits coordinate
        "256,192,1_000,1,0",                      # underscore time
        "256,192,1000,1_,0",                      # underscore type
        "256,192,1000,18446744073709551616,0",    # 2^64 type: saturate+int32
        "256,192,1000,4294967297,0",              # 2^32+1 type -> int32 1 = circle
        "256,192,1000,2,0,B|100:100|200:200,18446744073709551616,50",  # huge slides
        "256,192,1000,+1,0",                      # explicit sign accepted both
        "256,192,1000,1,0 ",                      # trailing space
    ]
    for line in lines:
        text = base.format(line=line)
        py_out = py_ok = None
        try:
            py_out = _python_featurize(text)
            py_ok = True
        except Exception:
            py_ok = False
        try:
            cc_out = native.featurize_text(text)
            cc_ok = True
        except Exception:
            cc_out, cc_ok = None, False
        assert py_ok == cc_ok, (line, py_ok, cc_ok)
        if py_ok and cc_ok:
            assert cc_out.shape == py_out.shape, line
            if cc_out.size:
                np.testing.assert_allclose(cc_out, py_out, rtol=1e-4, atol=2e-3,
                                           err_msg=line)


def test_curve_kind_agreement(native):
    """Unknown/empty slider curve kinds must get the same accept/reject
    decision from both parsers (the Python side raises via
    Curve.from_kind_and_points; native must not silently default to bezier)."""
    base = (
        "osu file format v14\n[TimingPoints]\n0,500,4,1,0,100,1,0\n"
        "[HitObjects]\n256,192,1000,2,0,{spec},1,50\n"
    )
    for spec, note in [
        ("B|100:100|200:200", "bezier ok"),
        ("L|100:100", "linear ok"),
        ("X|100:100", "unknown kind"),
        ("|100:100", "empty kind"),
        ("nan|100:100", "junk kind"),
    ]:
        text = base.format(spec=spec)
        try:
            _python_featurize(text)
            py_ok = True
        except Exception:
            py_ok = False
        try:
            native.featurize_text(text)
            cc_ok = True
        except Exception:
            cc_ok = False
        assert py_ok == cc_ok, (note, py_ok, cc_ok)


def test_bom_only_text_agreement(native):
    """BOM-only input: both paths must accept with zero hit objects (the
    Python parser previously crashed with IndexError)."""
    from osu_diffusion_tpu.beatmap.parser import parse_beatmap

    bm = parse_beatmap("﻿")
    assert bm.hit_objects() == []
    out = native.featurize_text("﻿")
    assert out.shape[0] == 0


OUT_OF_ORDER_TIMING = """osu file format v14

[General]
StackLeniency: 0.7

[Difficulty]
SliderMultiplier:1
SliderTickRate:1

[TimingPoints]
0,500,4,2,0,100,1
2000,400,4,2,0,100,1
1000,-50,4,2,0,100,0

[HitObjects]
100,100,2500,2,0,L|200:100,1,100
"""


def test_out_of_order_timing_points_unified(native):
    """Timing points are sorted by offset at parse time in BOTH parsers, so
    featurization and the export layer resolve the same governing point even
    when the file's timing section is out of order (matching the `slider`
    package's sort-on-parse; this was the round-2 divergence flagged at
    parser.py:300-307)."""
    from datetime import timedelta

    bm = parse_beatmap(OUT_OF_ORDER_TIMING)
    # parsed list is sorted by offset
    offsets = [tp.offset for tp in bm.timing_points]
    assert offsets == sorted(offsets)

    # the slider at t=2500 is governed by the RED line at 2000 (SV 1.0, beat
    # 400ms) under sorted semantics -> span 400ms, end 2900. (File-order-last
    # would pick the green at 1000 -> SV 2.0 -> end 2700.)
    py_seq = _python_featurize(OUT_OF_ORDER_TIMING)
    assert py_seq[-1, 2] == pytest.approx(2900.0)
    cc_seq = native.featurize_text(OUT_OF_ORDER_TIMING)
    np.testing.assert_allclose(cc_seq, py_seq, rtol=1e-4, atol=2e-3)

    # the export layer agrees: timing_point_at resolves the same point
    gov = bm.timing_point_at(timedelta(milliseconds=2500))
    assert gov.offset == timedelta(milliseconds=2000) and gov.parent is None
    red = bm.uninherited_timing_point_at(timedelta(milliseconds=2500))
    assert red.ms_per_beat == pytest.approx(400.0)


def test_shuffled_timing_sections_agree(native):
    """Shuffling a beatmap's [TimingPoints] lines never changes featurization
    (sort-on-parse), and python/native stay bit-for-bit interchangeable."""
    rng = random.Random(7)
    checked = 0
    for path in SEEDS[:8]:
        with open(path, encoding="utf-8-sig") as f:
            text = f.read()
        lines = text.splitlines()
        try:
            start = next(i for i, l in enumerate(lines)
                         if l.strip() == "[TimingPoints]")
        except StopIteration:
            continue
        end = start + 1
        while end < len(lines) and not lines[end].strip().startswith("["):
            end += 1
        body = [l for l in lines[start + 1:end] if l.strip()]
        if len(body) < 2:
            continue
        baseline = _python_featurize(text)
        for _ in range(3):
            rng.shuffle(body)
            shuffled = "\n".join(lines[:start + 1] + body + lines[end:])
            py_seq = _python_featurize(shuffled)
            np.testing.assert_allclose(py_seq, baseline, rtol=1e-4, atol=2e-3)
            cc_seq = native.featurize_text(shuffled)
            np.testing.assert_allclose(cc_seq, py_seq, rtol=1e-4, atol=2e-3)
            checked += 1
    assert checked >= 3
