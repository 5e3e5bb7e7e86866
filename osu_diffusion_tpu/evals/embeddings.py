"""Style-embedding analytics: t-SNE projection, SVM tag/mapper classification,
nearest/furthest-neighbour queries, checkpoint introspection.

Ports of reference testing/plot_embeddings.py, embedding_svm.py,
find_similar_beatmaps.py, find_unique_beatmaps.py and print_ckpt.py, as
functions with explicit inputs (the reference scripts hardcode Windows paths)
plus CLI subcommands. Works with both reference torch `.pt` checkpoints and
this framework's orbax checkpoints.
"""
from __future__ import annotations

import os
import pickle

import numpy as np


def load_embedding_table(ckpt_path: str) -> np.ndarray:
    """(num_classes+1[, padded], hidden) style table from any checkpoint kind."""
    if os.path.isfile(ckpt_path):
        import torch

        ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
        if "ema" in ckpt:
            ckpt = ckpt["ema"]
        return ckpt["y_embedder.embedding_table.weight"].numpy()
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(ckpt_path))
    params = restored.get("ema_params", restored.get("params", restored))
    return np.asarray(params["y_embedder"]["embedding_table"]["embedding"])


def tsne_embeddings(
    embedding_table: np.ndarray,
    num_classes: int = 52670,
    cache_file: str | None = None,
    random_state: int = 1,
    n_iter: int = 1000,
) -> np.ndarray:
    """2-D t-SNE of the style table, cosine metric, cached to .npy.
    Parity: plot_embeddings.py:186-196."""
    if cache_file is not None and os.path.isfile(cache_file):
        return np.load(cache_file)
    from sklearn.manifold import TSNE

    tsne = TSNE(random_state=random_state, max_iter=n_iter, metric="cosine")
    embs = tsne.fit_transform(embedding_table)[:num_classes]
    if cache_file is not None:
        np.save(cache_file, embs)
    return embs


def fit_tag_svm(
    embedding_table: np.ndarray,
    groups: list[np.ndarray],
):
    """Linear SVM over style embeddings; groups = per-class index arrays.
    Parity: embedding_svm.py:62-75. Returns the fitted classifier."""
    from sklearn import svm

    xs = [embedding_table[idx] for idx in groups]
    ys = [np.full(len(idx), k) for k, idx in enumerate(groups)]
    clf = svm.SVC(kernel="linear", probability=True)
    clf.fit(np.concatenate(xs), np.concatenate(ys))
    return clf


def svm_accuracy(clf, embedding_table: np.ndarray, indices: np.ndarray, label: int) -> float:
    from sklearn import metrics

    pred = clf.predict(embedding_table[indices])
    return float(metrics.accuracy_score(np.full(len(indices), label), pred))


def find_similar(
    embedding_table: np.ndarray,
    beatmap_idx: dict[int, int],
    beatmap_id: int,
    k: int = 10,
    metric: str = "euclidean",
) -> list[tuple[int, float]]:
    """k most-distant (parity quirk: the reference's argpartition(-k) picks the
    LARGEST distances, find_similar_beatmaps.py:27-33) beatmaps by embedding
    distance. Returns [(beatmap_id, distance)]."""
    import scipy.spatial.distance

    idx_beatmap = {v: kk for kk, v in beatmap_idx.items()}
    query = embedding_table[beatmap_idx[beatmap_id]]
    dist = scipy.spatial.distance.cdist(
        embedding_table, query[None], metric=metric
    )[:, 0]
    picked = np.argpartition(dist, -k)[-k:]
    out = []
    for x in picked:
        if int(x) in idx_beatmap:
            out.append((idx_beatmap[int(x)], float(dist[x])))
    return out


def find_nearest(
    embedding_table: np.ndarray,
    beatmap_idx: dict[int, int],
    beatmap_id: int,
    k: int = 10,
    metric: str = "cosine",
) -> list[tuple[int, float]]:
    """k nearest beatmaps by embedding distance (the query the reference's
    script name promises; kept alongside the parity variant above)."""
    import scipy.spatial.distance

    idx_beatmap = {v: kk for kk, v in beatmap_idx.items()}
    query = embedding_table[beatmap_idx[beatmap_id]]
    dist = scipy.spatial.distance.cdist(
        embedding_table, query[None], metric=metric
    )[:, 0]
    picked = np.argsort(dist)[: k + 1]
    out = []
    for x in picked:
        if int(x) in idx_beatmap and int(x) != beatmap_idx[beatmap_id]:
            out.append((idx_beatmap[int(x)], float(dist[x])))
    return out[:k]


def mean_distance_to_group(
    embedding_table: np.ndarray, group_indices: np.ndarray
) -> np.ndarray:
    """Per-beatmap mean distance to a group (find_unique_beatmaps.py:29-31)."""
    import scipy.spatial.distance

    return np.mean(
        scipy.spatial.distance.cdist(embedding_table, embedding_table[group_indices]),
        axis=1,
    )


def print_ckpt(obj, indent: int = 0):
    """Recursive checkpoint structure dump. Parity: print_ckpt.py:4-16."""
    pad = "  " * indent
    if isinstance(obj, dict):
        for k, v in obj.items():
            if isinstance(v, (dict, list)):
                print(f"{pad}{k} \t state dict:")
                print_ckpt(v, indent + 1)
            elif hasattr(v, "shape"):
                print(f"{pad}{k} \t {tuple(v.shape)}")
            else:
                print(f"{pad}{k} \t {v}")
    elif isinstance(obj, list):
        for v in obj:
            print_ckpt(v, indent + 1)


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_tsne = sub.add_parser("tsne", help="2-D t-SNE projection of the style table")
    p_tsne.add_argument("--ckpt", required=True)
    p_tsne.add_argument("--num-classes", type=int, default=52670)
    p_tsne.add_argument("--cache-file", default="2d-embs.npy")
    p_tsne.add_argument("--plot", action="store_true")

    p_sim = sub.add_parser("similar", help="nearest/furthest beatmaps by style")
    p_sim.add_argument("--ckpt", required=True)
    p_sim.add_argument("--beatmap-idx", default=os.path.join("assets", "beatmap_idx.pickle"))
    p_sim.add_argument("--beatmap-id", type=int, required=True)
    p_sim.add_argument("-k", type=int, default=10)
    p_sim.add_argument("--nearest", action="store_true",
                       help="true nearest neighbours instead of the reference's "
                            "largest-distance parity behavior")

    p_print = sub.add_parser("print", help="dump checkpoint structure")
    p_print.add_argument("--ckpt", required=True)

    args = parser.parse_args(argv)

    if args.cmd == "tsne":
        table = load_embedding_table(args.ckpt)
        embs = tsne_embeddings(table, args.num_classes, args.cache_file)
        print(f"t-SNE embeddings: {embs.shape} (cached at {args.cache_file})")
        if args.plot:
            import matplotlib.pyplot as plt

            plt.figure(figsize=(13, 9))
            plt.scatter(embs[:, 0], embs[:, 1], alpha=0.01)
            plt.show()
    elif args.cmd == "similar":
        table = load_embedding_table(args.ckpt)
        with open(args.beatmap_idx, "rb") as f:
            beatmap_idx = pickle.load(f)
        fn = find_nearest if args.nearest else find_similar
        for bid, dist in fn(table, beatmap_idx, args.beatmap_id, args.k):
            print(bid, dist)
    elif args.cmd == "print":
        if os.path.isfile(args.ckpt):
            import torch

            print("Model's state_dict:")
            print_ckpt(torch.load(args.ckpt, map_location="cpu", weights_only=False))
        else:
            import orbax.checkpoint as ocp

            with ocp.StandardCheckpointer() as ckptr:
                print_ckpt(ckptr.restore(os.path.abspath(args.ckpt)))


if __name__ == "__main__":
    main()
