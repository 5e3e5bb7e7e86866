"""Synthetic-corpus generator (tools/make_corpus.py): validity of the
generated files under both parsers, dataset-layout conventions, and the
streaming loader consuming a generated corpus end-to-end.

The corpus stands in for the reference's ORS13402 dataset (52,670 maps /
13,402 sets, reference train.py:309-310) to prove the framework at the
reference's scale shape."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from make_corpus import generate_map, write_corpus  # noqa: E402


def test_generated_maps_parse_and_featurize(tmp_path):
    from osu_diffusion_tpu.beatmap import Beatmap
    from osu_diffusion_tpu.data import beatmap_to_sequence

    for i in range(12):
        path = tmp_path / f"{i:06d} test.osu"
        path.write_text(generate_map(i, i // 4, seed=0))
        bm = Beatmap.from_path(str(path))
        seq = beatmap_to_sequence(bm)
        # enough rows for several seq-len-128 windows
        assert seq.shape[0] >= 176
        assert seq.shape[1] == 19
        # times non-decreasing within int-rounding tolerance
        assert np.all(np.diff(seq[:, 2]) >= -0.5)
        # coordinates near the playfield: anchors are clipped in-field but
        # computed slider END positions (curve engine) may overshoot a bit,
        # as on real maps — the model's x0 clamp is [-1,2] in normalized
        # units, i.e. [-512,1024]x[-384,768]
        assert seq[:, 0].min() >= -160 and seq[:, 0].max() <= 672
        assert seq[:, 1].min() >= -160 and seq[:, 1].max() <= 544


def test_generated_maps_native_parser_parity(tmp_path):
    from osu_diffusion_tpu import native
    from osu_diffusion_tpu.beatmap import Beatmap
    from osu_diffusion_tpu.data import beatmap_to_sequence

    if not native.available():
        pytest.skip("native featurizer not built")
    for i in (0, 7, 31):
        path = tmp_path / f"{i:06d} test.osu"
        path.write_text(generate_map(i, i // 4, seed=0))
        a = beatmap_to_sequence(Beatmap.from_path(str(path)))
        b = native.featurize_file(str(path))
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=2e-2)


def test_generation_is_deterministic():
    assert generate_map(5, 1, seed=3) == generate_map(5, 1, seed=3)
    assert generate_map(5, 1, seed=3) != generate_map(5, 1, seed=4)
    assert generate_map(5, 1, seed=3) != generate_map(6, 1, seed=3)


def test_corpus_layout_and_loader(tmp_path):
    """write_corpus lays out TrackNNNNN/beatmaps/NNNNNN*.osu and the real
    streaming loader yields windows with the filename-prefix labels."""
    from osu_diffusion_tpu.data.dataset import (
        BeatmapDatasetIterableFactory,
        get_data_loader,
    )

    out = str(tmp_path / "corpus")
    write_corpus(out, num_files=8, maps_per_track=4, seed=0,
                 min_datapoints=176, progress_every=0)
    assert sorted(os.listdir(out)) == ["Track00000", "Track00001"]
    assert len(os.listdir(os.path.join(out, "Track00001", "beatmaps"))) == 4

    loader = get_data_loader(
        dataset_path=out, start=0, end=2,
        iterable_factory=BeatmapDatasetIterableFactory(seq_len=128, stride=16),
        cycle_length=2, batch_size=4, num_workers=0,
        shuffle=False, drop_last=True,
    )
    seen_labels = set()
    for b, ((win, prev), y) in enumerate(loader):
        assert win.shape == (4, 128, 19)
        assert prev.shape == (4, 2)
        seen_labels.update(int(v) for v in y)
        if b >= 5:
            break
    assert seen_labels <= set(range(8)) and len(seen_labels) >= 2
