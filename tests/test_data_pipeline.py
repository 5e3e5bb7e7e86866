"""Featurizer + pipeline tests (reference data_loading.py parity)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from osu_diffusion_tpu.beatmap import Beatmap, Slider
from osu_diffusion_tpu.data import (
    BeatmapDatasetIterable,
    BeatmapDatasetIterableFactory,
    InterleavingBeatmapDatasetIterable,
    beatmap_to_sequence,
    calc_distances,
    get_data,
    process_batch,
    repeat_type,
    split_and_process_sequence_no_augment,
    window_and_relative_time,
)
from osu_diffusion_tpu.data.featurize import create_datapoint
from datetime import timedelta

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets", "toy_datasets")
KIMI = os.path.join(ASSETS, "kimi_no_bouken.osu")


def test_repeat_type():
    # parity: data_loading.py:42-48
    assert [repeat_type(r) for r in [1, 2, 3, 4, 5, 6, 7]] == [0, 1, 2, 3, 4, 3, 4]


def test_create_datapoint_layout():
    from osu_diffusion_tpu.beatmap.objects import Position

    dp = create_datapoint(timedelta(milliseconds=1500), Position(100, 200), 5)
    assert dp.shape == (19,)
    assert dp[0] == 100 and dp[1] == 200 and dp[2] == 1500
    assert dp[3 + 5] == 1 and dp.sum() == 100 + 200 + 1500 + 1


def test_beatmap_to_sequence_kimi():
    bm = Beatmap.from_path(KIMI)
    seq = beatmap_to_sequence(bm)
    assert seq.ndim == 2 and seq.shape[1] == 19
    # more datapoints than hit objects (sliders expand)
    assert seq.shape[0] > len(bm.hit_objects())
    # time is nondecreasing
    assert (np.diff(seq[:, 2]) >= -1e-6).all()
    # each row has exactly one type flag
    assert np.all(seq[:, 3:].sum(axis=1) == 1.0)


def test_slider_expansion_types():
    bm = Beatmap.from_path(KIMI)
    sliders = [h for h in bm.hit_objects() if isinstance(h, Slider)]
    rows = get_data(sliders[0])
    types = np.argmax(rows[:, 3:], axis=1)
    # head(4/5), ... anchors ..., last anchor(10), slider end (11+rt)
    assert types[0] in (4, 5)
    assert types[-2] == 10
    assert 11 <= types[-1] <= 15


def test_calc_distances_center_start():
    seq = np.zeros((3, 19), dtype=np.float32)
    seq[0, :2] = [256, 192]  # at center -> distance 0
    seq[1, :2] = [256, 292]  # 100 from previous
    seq[2, :2] = [356, 292]
    d = np.asarray(calc_distances(jnp.asarray(seq)))
    np.testing.assert_allclose(d, [0.0, 100.0, 100.0], atol=1e-5)


def test_calc_distances_prev_xy():
    seq = np.zeros((1, 19), dtype=np.float32)
    seq[0, :2] = [10, 0]
    d = np.asarray(calc_distances(jnp.asarray(seq), jnp.asarray([0.0, 0.0])))
    np.testing.assert_allclose(d, [10.0], atol=1e-5)


def test_split_no_augment_shapes_and_values():
    bm = Beatmap.from_path(KIMI)
    seq = beatmap_to_sequence(bm)[:32]
    (x, o, c), t = split_and_process_sequence_no_augment(jnp.asarray(seq))
    assert t == 32
    assert x.shape == (32, 2) and o.shape == (32,) and c.shape == (32, 144)
    np.testing.assert_allclose(
        np.asarray(x), seq[:, :2] / np.array([512.0, 384.0]), atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(o), seq[:, 2], atol=1e-5)
    # last 16 context channels are the type one-hots
    np.testing.assert_allclose(np.asarray(c[:, 128:]), seq[:, 3:], atol=1e-6)


def test_window_and_relative_time():
    seq = np.zeros((10, 19), dtype=np.float32)
    seq[:, 2] = np.arange(10) * 100.0
    (x, o, c), _ = split_and_process_sequence_no_augment(jnp.asarray(seq))
    xw, ow, cw = window_and_relative_time((x, o, c), 2, 6, 0.5)
    assert xw.shape == (4, 2) and ow.shape == (4,) and cw.shape == (4, 144)
    np.testing.assert_allclose(
        np.asarray(ow), np.arange(4) * 100.0 + 0.5 * 100000.0, atol=1e-2
    )


def test_process_batch_jit_and_augment_marginals():
    raw = np.random.RandomState(0).rand(8, 16, 19).astype(np.float32)
    raw[..., :2] *= [512, 384]
    raw[..., 2] = np.cumsum(np.abs(raw[..., 2]), axis=1) * 100
    prev = np.full((8, 2), [256.0, 192.0], dtype=np.float32)
    fn = jax.jit(lambda r: process_batch(jnp.asarray(raw), jnp.asarray(prev), r))
    x, o, c = fn(jax.random.PRNGKey(0))
    assert x.shape == (8, 16, 2) and o.shape == (8, 16) and c.shape == (8, 16, 144)
    # time re-zeroed to offset in [0, 100000)
    o0 = np.asarray(o[:, 0])
    assert (o0 >= 0).all() and (o0 < 100000).all()
    # flips preserve normalized range
    assert np.asarray(x).min() >= 0 - 1e-5 and np.asarray(x).max() <= 1 + 1e-5
    # augmentation differs across seeds, deterministic per seed
    x2, _, _ = fn(jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(x), np.asarray(x2))
    x3, _, _ = fn(jax.random.PRNGKey(1))
    assert not np.array_equal(np.asarray(x), np.asarray(x3))


def test_dataset_iterable_windows():
    import random

    files = [KIMI]
    it = BeatmapDatasetIterable(files, seq_len=64, stride=16, rng=random.Random(0))
    items = list(it)
    assert len(items) > 10
    (win, prev), label = items[0]
    assert win.shape == (64, 19) and prev.shape == (2,)
    assert label == 0  # non-numeric fixture name falls back to 0


def test_interleaving_mixes_and_fixes_skip_bug():
    # two single-file shards: round robin alternates, exhaustion doesn't skip
    import random

    factory = BeatmapDatasetIterableFactory(64, 64, seed=0)
    inter = InterleavingBeatmapDatasetIterable([KIMI, KIMI], factory, 2)
    labels = [label for _, label in inter]
    assert len(labels) > 4  # both shards fully drained


def test_label_is_filename_prefix(tmp_path):
    import shutil, random

    # reference labels come from the first 6 chars of the file name
    # (data_loading.py:255); create a properly named copy
    target = tmp_path / "012345 something.osu"
    shutil.copy(KIMI, target)
    it = BeatmapDatasetIterable([str(target)], seq_len=64, stride=64, rng=random.Random(0))
    (_, label) = next(it)
    assert label == 12345


def test_epochs_reroll_phases_and_shuffle_deterministically(tmp_path):
    """Each epoch must re-roll window phases and shuffle order (the reference
    uses fresh unseeded RNG per epoch, data_loading.py:257,352-353) while
    remaining reproducible for a fixed seed across loader instances."""
    import shutil

    from osu_diffusion_tpu.data.dataset import BeatmapDataset

    track = tmp_path / "Track00000" / "beatmaps"
    track.mkdir(parents=True)
    for i in range(4):
        shutil.copy(KIMI, track / f"{i:06d} map.osu")

    def make_dataset():
        return BeatmapDataset(
            dataset_path=str(tmp_path),
            start=0,
            end=1,
            iterable_factory=BeatmapDatasetIterableFactory(64, 16, seed=7),
            cycle_length=2,
            shuffle=True,
            seed=7,
        )

    def epoch_stream(ds):
        # (label, first-row time) identifies the window phase within the file
        return [(label, float(win[0, 2])) for (win, _prev), label in ds]

    ds = make_dataset()
    e0, e1 = epoch_stream(ds), epoch_stream(ds)

    # different phases/order across epochs...
    assert e0 != e1
    # ...but the same files visited (a different phase can change a file's
    # window count by one, so compare the label SET, not the multiset)
    assert {l for l, _ in e0} == {l for l, _ in e1}
    assert abs(len(e0) - len(e1)) <= 4  # at most one window per file

    # deterministic: a fresh loader with the same seed replays both epochs
    ds2 = make_dataset()
    assert epoch_stream(ds2) == e0
    assert epoch_stream(ds2) == e1

    # set_epoch replays a chosen epoch
    ds3 = make_dataset()
    ds3.set_epoch(1)
    assert epoch_stream(ds3) == e1


def test_plain_callable_factories_still_work(tmp_path):
    """BeatmapDataset must keep accepting factories without the epoch
    protocol (host-side custom seq/win funcs)."""
    import shutil

    from osu_diffusion_tpu.data.dataset import BeatmapDataset

    track = tmp_path / "Track00000" / "beatmaps"
    track.mkdir(parents=True)
    shutil.copy(KIMI, track / "000001 map.osu")

    import random

    ds = BeatmapDataset(
        dataset_path=str(tmp_path),
        start=0,
        end=1,
        iterable_factory=lambda files: BeatmapDatasetIterable(
            files, seq_len=64, stride=64, rng=random.Random(0)
        ),
        cycle_length=1,
    )
    assert len(list(ds)) > 0


def test_loader_skips_unparseable_files(tmp_path):
    """A malformed .osu file must be skipped with a warning, not kill the
    loader worker (robustness spec, beatmap/parser.py docstring)."""
    import shutil, random

    good = tmp_path / "000001 good.osu"
    shutil.copy(KIMI, good)
    bad = tmp_path / "000002 bad.osu"
    bad.write_text("osu file format v14\n[HitObjects]\nnan,192,1000,1,0\n")
    good2 = tmp_path / "000003 good.osu"
    shutil.copy(KIMI, good2)

    it = BeatmapDatasetIterable(
        [str(good), str(bad), str(good2)], seq_len=64, stride=64,
        rng=random.Random(0),
    )
    labels = {label for _, label in it}
    assert labels == {1, 3}  # both good files yielded, bad one skipped


def _toy_tracks(tmp_path, n_tracks=2, per_track=2):
    import shutil

    src = sorted(
        __import__("glob").glob(
            os.path.join(os.path.dirname(__file__), "..", "assets",
                         "toy_datasets", "stream", "*.osu")
        )
    )
    i = 0
    files = []
    for tr in range(n_tracks):
        d = tmp_path / f"Track{tr:05d}" / "beatmaps"
        d.mkdir(parents=True)
        for _ in range(per_track):
            dst = d / f"{i:06d} map.osu"
            shutil.copy(src[i % len(src)], dst)
            files.append(str(dst))
            i += 1
    return files


def test_loader_respects_beatmap_files_with_workers(tmp_path):
    """An explicit beatmap_files subset must constrain MULTI-WORKER loading
    too (the worker shards previously fell back to the whole Track tree)."""
    from osu_diffusion_tpu.data.dataset import (
        BeatmapDatasetIterableFactory,
        get_data_loader,
    )

    files = _toy_tracks(tmp_path, n_tracks=2, per_track=3)
    subset = files[:2]  # only the first two maps

    def labels_of(num_workers):
        loader = get_data_loader(
            dataset_path=str(tmp_path), start=0, end=2,
            iterable_factory=BeatmapDatasetIterableFactory(4, 2, seed=0),
            cycle_length=1, batch_size=1, num_workers=num_workers,
            shuffle=False, drop_last=False, beatmap_files=subset, seed=0,
        )
        out = set()
        for _, y in loader:
            out.update(int(v) for v in y)
        return out

    assert labels_of(0) == labels_of(2) == {0, 1}


def test_loader_early_exit_leaves_no_threads(tmp_path):
    """Breaking out of a multi-worker epoch must not leak producer threads."""
    import threading
    import time

    from osu_diffusion_tpu.data.dataset import (
        BeatmapDatasetIterableFactory,
        get_data_loader,
    )

    _toy_tracks(tmp_path, n_tracks=2, per_track=3)
    loader = get_data_loader(
        dataset_path=str(tmp_path), start=0, end=2,
        iterable_factory=BeatmapDatasetIterableFactory(4, 2, seed=0),
        cycle_length=2, batch_size=1, num_workers=2,
        shuffle=False, drop_last=False, seed=0,
    )
    before = threading.active_count()
    it = iter(loader)
    next(it)
    it.close()  # early exit mid-epoch
    time.sleep(0.5)
    assert threading.active_count() <= before


def test_cached_loader_is_reiterable(tmp_path):
    """The cached loader must yield the same batches on every pass (torch
    DataLoader semantics), not exhaust after the first epoch."""
    from osu_diffusion_tpu.data.dataset import (
        BeatmapDatasetIterableFactory,
        cache_dataset,
        get_cached_data_loader,
    )

    _toy_tracks(tmp_path, n_tracks=1, per_track=2)
    cache_path = str(tmp_path / "cache.pkl")
    cache_dataset(
        cache_path, dataset_path=str(tmp_path), start=0, end=1,
        iterable_factory=BeatmapDatasetIterableFactory(4, 2, seed=0),
    )
    loader = get_cached_data_loader(cache_path, batch_size=2)
    n1 = sum(1 for _ in loader)
    n2 = sum(1 for _ in loader)
    assert n1 == n2 > 0
