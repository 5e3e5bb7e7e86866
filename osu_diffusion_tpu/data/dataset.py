"""Streaming beatmap dataset: windowed iteration, interleaving, multiprocess
loading (L1 host side).

Behavioral parity with reference data_loading.py:206-511 without torch:
- `BeatmapDatasetIterable` walks files, yields overlapping windows of `seq_len`
  with `stride` and a random initial phase in [0, stride) (ref :206-267).
- `InterleavingBeatmapDatasetIterable` round-robins `cycle_length` disjoint file
  shards so one batch mixes many beatmaps (ref :270-304). The reference's
  removal-then-skip bug on sub-iterator exhaustion (ref :294-304, SURVEY §7
  "defects to NOT replicate") is fixed: after removing an exhausted worker the
  same index is retried, so no iterator is skipped.
- `get_data_loader` shards the beatmap-set range across `num_workers`
  processes — each worker produces whole batches (same as torch DataLoader's
  per-worker sharding via worker_init_fn, ref :366-376) — and streams them
  through a queue with background prefetch.

TPU-native default item: a RAW window — (seq_len, 19) float32 rows plus the
predecessor's (2,) coordinates and the int label — so the expensive embedding /
augmentation work runs on device inside the jitted train step
(osu_diffusion_tpu.data.process.process_batch). The reference instead embeds on
the host in loader workers (ref load_and_process_beatmap :190-192). Host-side
processing is still available by passing seq_func/win_func like the reference's
factory (ref :394-411).
"""
from __future__ import annotations

import math
import os
import pickle
import queue
import random
import threading
from pathlib import Path, PurePosixPath, PureWindowsPath
from typing import Callable, Optional

import numpy as np

from osu_diffusion_tpu.beatmap.objects import Beatmap
from osu_diffusion_tpu.data.featurize import beatmap_to_sequence

CENTER = np.array([256.0, 192.0], dtype=np.float32)


def _mix_seed(seed: int, epoch: int, sub: int = 0) -> int:
    """Deterministic per-(epoch, sub-iterator) seed derivation: the reference
    re-rolls shuffle order and window phases every epoch via unseeded RNG
    (data_loading.py:257,352-353); we keep that per-epoch diversity but stay
    reproducible for a given base seed."""
    return ((seed * 1000003 + epoch) * 1000003 + sub) & 0xFFFFFFFFFFFF


def default_seq_func(beatmap_path: str):
    """Raw featurization from a file path: (T, 19) array; returns (seq, T).

    Uses the native C++ parser+featurizer when built (39x the Python path,
    GIL-free — see native/osu_native.cpp); transparently falls back to the
    Python beatmap layer. Set OSU_DIFFUSION_NO_NATIVE=1 to force the fallback.
    """
    if not os.environ.get("OSU_DIFFUSION_NO_NATIVE"):
        from osu_diffusion_tpu import native

        if native.available():
            seq = native.featurize_file(beatmap_path)
            return seq, seq.shape[0]
    seq = beatmap_to_sequence(Beatmap.from_path(beatmap_path))
    return seq, seq.shape[0]


def default_win_func(seq: np.ndarray, s: int, e: int):
    """Raw window + predecessor coordinates for the distance feature."""
    window = seq[s:e]
    prev_xy = seq[s - 1, :2] if s > 0 else CENTER
    return window, prev_xy.astype(np.float32)


class BeatmapDatasetIterable:
    """Per-shard window iterator. Parity: data_loading.py:206-267.

    Yields (win_func(seq, s, s+seq_len), label) where the label is the integer
    prefix of the filename (the beatmap's class index, ref :255).
    """

    __slots__ = (
        "beatmap_files", "seq_len", "stride", "index", "current_idx",
        "current_seq", "current_seq_len", "seq_index", "seq_func", "win_func",
        "rng",
    )

    def __init__(
        self,
        beatmap_files: list[str],
        seq_len: int,
        stride: int,
        seq_func: Callable = default_seq_func,
        win_func: Callable = default_win_func,
        rng: random.Random | None = None,
    ):
        self.beatmap_files = beatmap_files
        self.seq_len = seq_len
        self.stride = stride
        self.index = 0
        self.current_idx = 0
        self.current_seq = None
        self.current_seq_len = -1
        self.seq_index = 0
        self.seq_func = seq_func
        self.win_func = win_func
        self.rng = rng or random.Random()

    def __iter__(self):
        return self

    def __next__(self):
        while (
            self.current_seq is None
            or self.seq_index + self.seq_len > self.current_seq_len
        ):
            if self.index >= len(self.beatmap_files):
                raise StopIteration
            beatmap_path = self.beatmap_files[self.index]
            # label = integer prefix of the filename (parity data_loading.py:255);
            # non-dataset files (e.g. toy fixtures) fall back to label 0
            try:
                self.current_idx = int(os.path.basename(beatmap_path)[:6])
            except ValueError:
                self.current_idx = 0
            self.index += 1
            # seq_func takes the PATH (not a parsed Beatmap like the reference
            # data_loading.py:253-256) so the native parser can skip Python
            # object construction entirely
            try:
                self.current_seq, self.current_seq_len = self.seq_func(
                    str(beatmap_path)
                )
            except Exception as e:
                # a malformed file (parser robustness spec, beatmap/parser.py)
                # must not kill a loader worker mid-run — skip it loudly
                import logging

                logging.getLogger(__name__).warning(
                    "skipping unparseable beatmap %s: %s", beatmap_path, e
                )
                self.current_seq = None
                self.current_seq_len = -1
                continue
            self.seq_index = self.rng.randint(0, self.stride - 1)
        window = self.win_func(
            self.current_seq, self.seq_index, self.seq_index + self.seq_len
        )
        self.seq_index += self.stride
        return window, self.current_idx


class InterleavingBeatmapDatasetIterable:
    """Round-robin over `cycle_length` disjoint file shards.
    Parity: data_loading.py:270-304 (exhaustion bug fixed — see module doc)."""

    __slots__ = ("workers", "cycle_length", "index")

    def __init__(
        self,
        beatmap_files: list[str],
        iterable_factory: Callable,
        cycle_length: int,
    ):
        per_worker = int(math.ceil(len(beatmap_files) / float(cycle_length)))
        self.workers = [
            iterable_factory(
                beatmap_files[i * per_worker : min(len(beatmap_files), (i + 1) * per_worker)]
            )
            for i in range(cycle_length)
        ]
        self.cycle_length = cycle_length
        self.index = 0

    def __iter__(self):
        return self

    def __next__(self):
        while self.workers:
            self.index = self.index % len(self.workers)
            try:
                item = next(self.workers[self.index])
                self.index += 1
                return item
            except StopIteration:
                del self.workers[self.index]
        raise StopIteration


class BeatmapDatasetIterableFactory:
    """Parity: data_loading.py:394-411.

    `accepts_epoch` marks the extended protocol: BeatmapDataset passes the
    current epoch and a per-epoch sub-iterator index so window phases re-roll
    every epoch (deterministically for a fixed seed) and each interleaver
    sub-iterator draws a distinct phase stream."""

    __slots__ = ("seq_len", "stride", "seq_func", "win_func", "seed")
    accepts_epoch = True

    def __init__(
        self,
        seq_len: int,
        stride: int,
        seq_func: Callable = default_seq_func,
        win_func: Callable = default_win_func,
        seed: int | None = None,
    ):
        self.seq_len = seq_len
        self.stride = stride
        self.seq_func = seq_func
        self.win_func = win_func
        self.seed = seed

    def __call__(
        self, beatmap_files: list[str], epoch: int = 0, sub: int = 0
    ) -> BeatmapDatasetIterable:
        rng = (
            random.Random(_mix_seed(self.seed, epoch, sub))
            if self.seed is not None
            else random.Random()
        )
        return BeatmapDatasetIterable(
            beatmap_files,
            seq_len=self.seq_len,
            stride=self.stride,
            seq_func=self.seq_func,
            win_func=self.win_func,
            rng=rng,
        )


class BeatmapDataset:
    """Iterable over `TrackNNNNN/beatmaps/*` in [start, end).
    Parity: data_loading.py:307-362."""

    def __init__(
        self,
        dataset_path: str,
        start: int,
        end: int,
        iterable_factory: Callable,
        cycle_length: int = 1,
        shuffle: bool = False,
        beatmap_files: Optional[list[str]] = None,
        seed: int | None = None,
    ):
        self.dataset_path = dataset_path
        self.start = start
        self.end = end
        self.iterable_factory = iterable_factory
        self.cycle_length = cycle_length
        self.shuffle = shuffle
        self.beatmap_files = beatmap_files
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Pin the epoch counter (e.g. to replay a specific epoch's stream);
        __iter__ otherwise advances it automatically."""
        self.epoch = epoch

    def _get_beatmap_files(self) -> list[str]:
        if self.beatmap_files is not None:
            return list(self.beatmap_files)
        beatmap_files = []
        for i in range(self.start, self.end):
            track_dir = os.path.join(
                self.dataset_path, "Track" + str(i).zfill(5), "beatmaps"
            )
            if not os.path.isdir(track_dir):
                continue
            for name in os.listdir(track_dir):
                beatmap_files.append(os.path.join(track_dir, name))
        return beatmap_files

    def __iter__(self):
        epoch = self.epoch
        self.epoch += 1  # each pass re-rolls shuffle order and window phases
        beatmap_files = self._get_beatmap_files()
        if self.shuffle:
            rng = (
                random.Random(_mix_seed(self.seed, epoch))
                if self.seed is not None
                else random
            )
            rng.shuffle(beatmap_files)

        if getattr(self.iterable_factory, "accepts_epoch", False):
            sub_counter = iter(range(1 << 30))

            def make_iterable(files):
                return self.iterable_factory(files, epoch=epoch, sub=next(sub_counter))
        else:  # plain callables (host-side custom factories) keep working
            make_iterable = self.iterable_factory

        if self.cycle_length > 1:
            return InterleavingBeatmapDatasetIterable(
                beatmap_files, make_iterable, self.cycle_length
            )
        return make_iterable(beatmap_files)


# ---------------------------------------------------------------------------
# index / metadata helpers (parity: data_loading.py:379-391)
# ---------------------------------------------------------------------------


def get_beatmap_idx(name) -> dict[int, int]:
    p = Path(name)
    with p.open("rb") as f:
        return pickle.load(f)


def get_beatmap_files(name: str, data_path: str) -> list[PurePosixPath]:
    with Path(name).open("rb") as f:
        relative = pickle.load(f)
    # Windows-relative paths in the pickle are remapped (parity :386-391)
    return [PurePosixPath(data_path, *PureWindowsPath(f).parts) for f in relative]


# ---------------------------------------------------------------------------
# cached datasets (parity: data_loading.py:414-475)
# ---------------------------------------------------------------------------


class CachedDataset:
    __slots__ = ("cached_data",)

    def __init__(self, cached_data):
        self.cached_data = cached_data

    def __getitem__(self, index):
        return self.cached_data[index]

    def __len__(self):
        return len(self.cached_data)

    def __iter__(self):
        return iter(self.cached_data)


def cache_dataset(
    out_path: str,
    dataset_path: str,
    start: int,
    end: int,
    iterable_factory: Callable,
    cycle_length: int = 1,
    beatmap_files: Optional[list[str]] = None,
) -> None:
    """Materialize the streaming dataset to a pickle (ref uses torch.save)."""
    dataset = BeatmapDataset(
        dataset_path=dataset_path,
        start=start,
        end=end,
        iterable_factory=iterable_factory,
        cycle_length=cycle_length,
        shuffle=False,
        beatmap_files=beatmap_files,
    )
    cached = list(dataset)
    with open(out_path, "wb") as f:
        pickle.dump(cached, f)


def get_cached_data_loader(
    data_path: str,
    batch_size: int = 1,
    shuffle: bool = False,
    drop_last: bool = False,
    seed: int | None = None,
):
    with open(data_path, "rb") as f:
        cached = pickle.load(f)
    dataset = CachedDataset(cached)

    class _CachedLoader:
        """Re-iterable (a fresh pass per epoch, like torch's DataLoader —
        returning the generator directly would silently yield zero batches
        from the second epoch on). With a fixed seed the shuffle order still
        advances across epochs (seed is mixed with a pass counter, like
        BeatmapDataset._mix_seed) — matching the torch DataLoader semantics
        where the generator state carries over between epochs."""

        _epoch = 0

        def __iter__(self):
            order = list(range(len(dataset)))
            if shuffle:
                if seed is not None:
                    rng = random.Random((seed * 1_000_003 + self._epoch) & 0xFFFFFFFF)
                    type(self)._epoch += 1
                else:
                    rng = random
                rng.shuffle(order)
            batch = []
            for i in order:
                batch.append(dataset[i])
                if len(batch) == batch_size:
                    yield _collate(batch)
                    batch = []
            if batch and not drop_last:
                yield _collate(batch)

        def __len__(self):
            n = len(dataset)
            return n // batch_size if drop_last else -(-n // batch_size)

    return _CachedLoader()


# ---------------------------------------------------------------------------
# batched loader (replaces torch DataLoader, ref data_loading.py:478-511)
# ---------------------------------------------------------------------------


def _collate(items):
    """Stack [(window_tuple, label), ...] into batched numpy arrays."""
    wins, labels = zip(*items)
    if isinstance(wins[0], tuple):
        cols = tuple(np.stack(col, axis=0) for col in zip(*wins))
    else:
        cols = np.stack(wins, axis=0)
    return cols, np.asarray(labels, dtype=np.int32)


def _batch_iter(dataset: BeatmapDataset, batch_size: int, drop_last: bool):
    batch = []
    for item in dataset:
        batch.append(item)
        if len(batch) == batch_size:
            yield _collate(batch)
            batch = []
    if batch and not drop_last:
        yield _collate(batch)


class DataLoader:
    """Multi-worker batched loader.

    The beatmap-set range [start, end) is split contiguously across
    `num_workers` (parity with the reference worker_init_fn sharding,
    data_loading.py:366-376); each worker assembles whole batches and the main
    thread drains a shared queue. Workers are threads by default (beatmap
    parsing releases no GIL, but prefetching still overlaps with device steps);
    the planned native parser moves the heavy lifting out of Python.
    """

    def __init__(
        self,
        dataset_path: str,
        start: int,
        end: int,
        iterable_factory: Callable,
        cycle_length: int = 1,
        batch_size: int = 1,
        num_workers: int = 0,
        shuffle: bool = False,
        drop_last: bool = False,
        beatmap_files: Optional[list[str]] = None,
        seed: int | None = None,
        prefetch: int = 4,
    ):
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.num_workers = max(0, num_workers)
        self.dataset = BeatmapDataset(
            dataset_path=dataset_path,
            start=start,
            end=end,
            iterable_factory=iterable_factory,
            cycle_length=cycle_length,
            shuffle=shuffle,
            beatmap_files=beatmap_files,
            seed=seed,
        )
        self._shards: list[BeatmapDataset] = []
        if self.num_workers > 0:
            # an explicit beatmap_files list shards BY FILE — building the
            # worker shards from the [start, end) range alone would silently
            # train on the whole unfiltered Track tree (parity with the
            # reference worker_init_fn, which re-shards whatever the dataset
            # iterates, data_loading.py:366-376)
            if beatmap_files is not None:
                per_worker = int(
                    math.ceil(len(beatmap_files) / float(self.num_workers))
                )
                file_shards = [
                    beatmap_files[w * per_worker : (w + 1) * per_worker]
                    for w in range(self.num_workers)
                ]
            else:
                per_worker = int(math.ceil((end - start) / float(self.num_workers)))
                file_shards = [None] * self.num_workers
            for w in range(self.num_workers):
                if beatmap_files is None:
                    ws = start + w * per_worker
                    we = min(ws + per_worker, end)
                else:
                    ws, we = start, end
                self._shards.append(
                    BeatmapDataset(
                        dataset_path=dataset_path,
                        start=ws,
                        end=we,
                        iterable_factory=iterable_factory,
                        cycle_length=cycle_length,
                        shuffle=shuffle,
                        beatmap_files=file_shards[w],
                        seed=None if seed is None else seed + w,
                    )
                )
        self.prefetch = prefetch

    def __iter__(self):
        if self.num_workers == 0:
            yield from _batch_iter(self.dataset, self.batch_size, self.drop_last)
            return
        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch * self.num_workers)
        stop_ev = threading.Event()
        threads = []
        for shard in self._shards:
            t = threading.Thread(
                target=self._thread_main, args=(shard, out_q, stop_ev), daemon=True
            )
            t.start()
            threads.append(t)
        finished = 0
        try:
            while finished < len(threads):
                item = out_q.get()
                if item is None:
                    finished += 1
                    continue
                yield item
        finally:
            stop_ev.set()
            # drain until every producer exits: a single drain pass is not
            # enough — a blocked producer refills the bounded queue and would
            # leak the thread (and its parsed sequences) for the process
            # lifetime on early consumer exit
            for t in threads:
                while t.is_alive():
                    try:
                        out_q.get(timeout=0.05)
                    except queue.Empty:
                        pass
                t.join()

    def _thread_main(self, shard, out_q, stop_ev):
        try:
            for batch in _batch_iter(shard, self.batch_size, self.drop_last):
                if stop_ev.is_set():
                    break
                # bounded put that aborts when the consumer is gone
                while not stop_ev.is_set():
                    try:
                        out_q.put(batch, timeout=0.1)
                        break
                    except queue.Full:
                        continue
        finally:
            # the sentinel must be DELIVERED on normal completion (the running
            # consumer counts them) but must never block after stop (the
            # consumer then drains by thread liveness instead)
            while not stop_ev.is_set():
                try:
                    out_q.put(None, timeout=0.1)
                    break
                except queue.Full:
                    continue


def get_data_loader(
    dataset_path: str,
    start: int,
    end: int,
    iterable_factory: Callable,
    cycle_length: int = 1,
    batch_size: int = 1,
    num_workers: int = 0,
    shuffle: bool = False,
    pin_memory: bool = False,  # accepted for flag parity; meaningless off-torch
    drop_last: bool = False,
    beatmap_files: Optional[list[str]] = None,
    seed: int | None = None,
) -> DataLoader:
    """Parity with reference get_data_loader (data_loading.py:478-511)."""
    del pin_memory
    return DataLoader(
        dataset_path=dataset_path,
        start=start,
        end=end,
        iterable_factory=iterable_factory,
        cycle_length=cycle_length,
        batch_size=batch_size,
        num_workers=num_workers,
        shuffle=shuffle,
        drop_last=drop_last,
        beatmap_files=beatmap_files,
        seed=seed,
    )
