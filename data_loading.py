#!/usr/bin/env python
"""Data-pipeline inspection CLI. Parity with the reference's
`python data_loading.py --mode plotfirst|benchmark` (data_loading.py:514-568)."""
from __future__ import annotations

import argparse


def main(args):
    import numpy as np

    from osu_diffusion_tpu.data.dataset import (
        BeatmapDatasetIterableFactory,
        get_data_loader,
    )

    loader = get_data_loader(
        dataset_path=args.data_path,
        start=args.start,
        end=args.end,
        iterable_factory=BeatmapDatasetIterableFactory(args.seq_len, args.stride),
        cycle_length=1,
        batch_size=args.batch_size,
        num_workers=args.num_workers,
        shuffle=False,
        drop_last=True,
    )

    if args.mode == "plotfirst":
        import jax.numpy as jnp
        import matplotlib.pyplot as plt

        from osu_diffusion_tpu.ops.embeddings import (
            offset_sequence_embedding,
            position_sequence_embedding,
        )
        from osu_diffusion_tpu.data.process import (
            split_and_process_sequence_no_augment,
        )

        for (win, prev), y in loader:
            (x, o, c), _ = split_and_process_sequence_no_augment(
                jnp.asarray(win), jnp.asarray(prev)
            )
            print(x.shape, o.shape, c.shape, y.shape)
            pos_emb = position_sequence_embedding(x * jnp.asarray([512.0, 384.0]), 128)
            off_emb = offset_sequence_embedding(o / 10, 128)
            print(pos_emb.shape)
            print(off_emb.shape)
            print(y)
            for j in range(min(args.batch_size, win.shape[0])):
                fig, axs = plt.subplots(3, figsize=(5, 20))
                axs[0].imshow(np.asarray(pos_emb[j]))
                axs[1].imshow(np.asarray(off_emb[j]))
                axs[2].imshow(np.asarray(c[j]))
                print(y[j])
                plt.show()
            break
    elif args.mode == "benchmark":
        import time

        import tqdm

        n_batches = 0
        n_windows = 0
        start = time.perf_counter()
        for (win, prev), y in tqdm.tqdm(loader, total=args.benchmark_batches,
                                        smoothing=0.01):
            n_batches += 1
            n_windows += win.shape[0]
            if n_batches >= args.benchmark_batches:
                break
        elapsed = time.perf_counter() - start
        print(
            f"{n_batches} batches / {n_windows} windows in {elapsed:.2f}s "
            f"= {n_windows / elapsed:.1f} windows/sec"
        )


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-path", type=str, required=True)
    parser.add_argument("--mode", type=str, required=True,
                        choices=["plotfirst", "benchmark"])
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--num-workers", type=int, default=0)
    parser.add_argument("--start", type=int, default=0)
    parser.add_argument("--end", type=int, default=16291)
    parser.add_argument("--seq-len", type=int, default=128)
    parser.add_argument("--stride", type=int, default=16)
    parser.add_argument("--benchmark-batches", type=int, default=7000)
    main(parser.parse_args())
