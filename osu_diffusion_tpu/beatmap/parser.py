""".osu file parser.

Standalone implementation of the osu! beatmap text format (the subset the
pipeline needs — General/Editor/Metadata/Difficulty/Events/TimingPoints/
HitObjects; Colours and storyboard content are preserved as raw event lines or
skipped). Replaces the reference's external `slider` dependency
(reference requirements.txt:4).

Slider end times are derived the same way the game does: one span lasts
    length / (slider_multiplier * 100 * sv_multiplier) * beat_length  ms
with beat_length from the governing uninherited timing point and sv_multiplier
from the latest inherited point at the object's time.
"""
from __future__ import annotations

from datetime import timedelta
from pathlib import Path

from osu_diffusion_tpu.beatmap.objects import (
    Beatmap,
    Circle,
    Curve,
    Position,
    Slider,
    Spinner,
    TimingPoint,
)

_TYPE_CIRCLE = 1
_TYPE_SLIDER = 2
_TYPE_NEW_COMBO = 4
_TYPE_SPINNER = 8
_COMBO_SKIP_SHIFT = 4


def _parse_bool(v: str) -> bool:
    return v.strip() in ("1", "true", "True")


_SAMPLE_SETS = {"0": "None", "1": "Normal", "2": "Soft", "3": "Drum"}


def _split_sections(text: str) -> dict[str, list[str]]:
    sections: dict[str, list[str]] = {}
    current: list[str] | None = None
    for raw in text.splitlines():
        line = raw.rstrip("\r\n")
        stripped = line.strip()
        if stripped.startswith("[") and stripped.endswith("]"):
            current = sections.setdefault(stripped[1:-1], [])
            continue
        if current is None:
            continue
        current.append(line)
    return sections


def _kv(lines: list[str]) -> dict[str, str]:
    out = {}
    for line in lines:
        if not line.strip() or line.lstrip().startswith("//"):
            continue
        if ":" not in line:
            continue
        k, v = line.split(":", 1)
        out[k.strip()] = v.strip()
    return out


def _parse_timing_points(lines: list[str]) -> list[TimingPoint]:
    points: list[TimingPoint] = []
    last_uninherited: TimingPoint | None = None
    for line in lines:
        line = line.strip()
        if not line or line.startswith("//"):
            continue
        parts = line.split(",")
        if len(parts) < 2:
            continue
        offset = timedelta(milliseconds=float(parts[0]))
        beat_length = float(parts[1])
        meter = int(parts[2]) if len(parts) > 2 else 4
        sample_type = int(parts[3]) if len(parts) > 3 else 0
        sample_set = int(parts[4]) if len(parts) > 4 else 0
        volume = int(parts[5]) if len(parts) > 5 else 100
        uninherited = _parse_bool(parts[6]) if len(parts) > 6 else beat_length > 0
        kiai = _parse_bool(parts[7]) if len(parts) > 7 else False
        if uninherited and beat_length > 0:
            tp = TimingPoint(offset, beat_length, meter, sample_type, sample_set,
                             volume, None, kiai)
            last_uninherited = tp
        else:
            tp = TimingPoint(offset, beat_length, meter, sample_type, sample_set,
                             volume, last_uninherited, kiai)
        points.append(tp)
    return points


def _parse_hit_objects(
    lines: list[str], beatmap: Beatmap
) -> list:
    objs = []
    for line in lines:
        line = line.strip()
        if not line or line.startswith("//"):
            continue
        parts = line.split(",")
        if len(parts) < 5:
            continue
        x, y = float(parts[0]), float(parts[1])
        time = timedelta(milliseconds=float(parts[2]))
        type_bits = int(parts[3])
        hitsound = int(parts[4])
        new_combo = bool(type_bits & _TYPE_NEW_COMBO)
        combo_skip = (type_bits >> _COMBO_SKIP_SHIFT) & 0b111
        pos = Position(x, y)

        if type_bits & _TYPE_CIRCLE:
            objs.append(Circle(pos, time, hitsound, new_combo, combo_skip))
        elif type_bits & _TYPE_SPINNER:
            end_time = timedelta(milliseconds=float(parts[5])) if len(parts) > 5 else time
            objs.append(Spinner(pos, time, hitsound, new_combo, combo_skip, end_time))
        elif type_bits & _TYPE_SLIDER:
            curve_spec = parts[5]
            slides = int(parts[6]) if len(parts) > 6 else 1
            length = float(parts[7]) if len(parts) > 7 else 0.0
            # parts[8]/[9] are edgeSounds/edgeSets only when present; a short
            # line puts the hitSample (colon-separated) right after length
            edge_sounds = []
            edge_additions = []
            if len(parts) > 8 and parts[8] and ":" not in parts[8]:
                edge_sounds = [int(s) for s in parts[8].split("|")]
                if len(parts) > 9 and parts[9]:
                    edge_additions = parts[9].split("|")

            kind, *pt_strs = curve_spec.split("|")
            # the head position is the first control point (the file omits it)
            points = [pos] + [
                Position(float(px), float(py))
                for px, py in (s.split(":") for s in pt_strs if s)
            ]
            curve = Curve.from_kind_and_points(kind, points, length)

            red = _uninherited_at(beatmap.timing_points, time)
            green = _timing_at(beatmap.timing_points, time)
            ms_per_beat = red.ms_per_beat if red is not None else 500.0
            sv_mult = green.sv_multiplier if green is not None else 1.0
            velocity = beatmap.slider_multiplier * 100.0 * sv_mult  # px per beat
            span_ms = length / velocity * ms_per_beat if velocity > 0 else 0.0
            num_beats = length / velocity * slides if velocity > 0 else 0.0
            end_time = time + timedelta(milliseconds=span_ms * slides)
            objs.append(
                Slider(
                    position=pos,
                    time=time,
                    hitsound=hitsound,
                    new_combo=new_combo,
                    combo_skip=combo_skip,
                    end_time=end_time,
                    curve=curve,
                    repeat=slides,
                    length=length,
                    ticks=0,
                    num_beats=num_beats,
                    tick_rate=beatmap.slider_tick_rate,
                    ms_per_beat=ms_per_beat,
                    edge_sounds=edge_sounds,
                    edge_additions=edge_additions,
                ),
            )
    return objs


def _uninherited_at(points: list[TimingPoint], time: timedelta) -> TimingPoint | None:
    candidate = None
    for tp in points:
        if tp.parent is None and tp.offset <= time:
            candidate = tp
    if candidate is None:
        for tp in points:
            if tp.parent is None:
                return tp
    return candidate


def _timing_at(points: list[TimingPoint], time: timedelta) -> TimingPoint | None:
    candidate = None
    for tp in points:
        if tp.offset <= time:
            candidate = tp
    if candidate is None and points:
        candidate = points[0]
    return candidate


def parse_beatmap_file(path) -> Beatmap:
    text = Path(path).read_text(encoding="utf-8-sig", errors="replace")
    return parse_beatmap(text)


def parse_beatmap(text: str) -> Beatmap:
    first_line = text.lstrip("﻿").splitlines()[0] if text else ""
    format_version = 14
    if "osu file format v" in first_line:
        try:
            format_version = int(first_line.split("osu file format v")[1].strip())
        except ValueError:
            pass

    sections = _split_sections(text)
    general = _kv(sections.get("General", []))
    editor = _kv(sections.get("Editor", []))
    meta = _kv(sections.get("Metadata", []))
    diff = _kv(sections.get("Difficulty", []))

    bm = Beatmap(
        format_version=format_version,
        audio_filename=general.get("AudioFilename", "audio.mp3"),
        audio_lead_in=int(float(general.get("AudioLeadIn", 0))),
        preview_time=int(float(general.get("PreviewTime", -1))),
        countdown=int(float(general.get("Countdown", 0))),
        sample_set=general.get("SampleSet", "Normal"),
        stack_leniency=float(general.get("StackLeniency", 0.7)),
        mode=int(float(general.get("Mode", 0))),
        letterbox_in_breaks=_parse_bool(general.get("LetterboxInBreaks", "0")),
        widescreen_storyboard=_parse_bool(general.get("WidescreenStoryboard", "0")),
        bookmarks=[int(b) for b in editor.get("Bookmarks", "").split(",") if b.strip()],
        distance_spacing=float(editor.get("DistanceSpacing", 1.0)),
        beat_divisor=int(float(editor.get("BeatDivisor", 4))),
        grid_size=int(float(editor.get("GridSize", 4))),
        timeline_zoom=float(editor.get("TimelineZoom", 1.0)),
        title=meta.get("Title", ""),
        title_unicode=meta.get("TitleUnicode", meta.get("Title", "")),
        artist=meta.get("Artist", ""),
        artist_unicode=meta.get("ArtistUnicode", meta.get("Artist", "")),
        creator=meta.get("Creator", ""),
        version=meta.get("Version", ""),
        source=meta.get("Source", ""),
        tags=meta.get("Tags", "").split() if meta.get("Tags") else [],
        beatmap_id=int(meta.get("BeatmapID", 0)),
        beatmap_set_id=int(meta.get("BeatmapSetID", -1)),
        hp_drain_rate=float(diff.get("HPDrainRate", 5.0)),
        circle_size=float(diff.get("CircleSize", 5.0)),
        overall_difficulty=float(diff.get("OverallDifficulty", 5.0)),
        approach_rate=float(diff.get("ApproachRate", diff.get("OverallDifficulty", 5.0))),
        slider_multiplier=float(diff.get("SliderMultiplier", 1.4)),
        slider_tick_rate=float(diff.get("SliderTickRate", 1.0)),
        events=[l for l in sections.get("Events", [])],
    )
    bm.timing_points = _parse_timing_points(sections.get("TimingPoints", []))
    bm._hit_objects = _parse_hit_objects(sections.get("HitObjects", []), bm)
    return bm
