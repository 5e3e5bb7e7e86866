"""Shared measurement harness for the sampling benchmarks.

bench.py (the official headline), tools/bench_accel.py and
tools/bench_quant.py must measure IDENTICALLY or their numbers are not
comparable — the round-2 headline "regression" was a harness artifact
(PARITY.md "Headline bench variance"), so the grouped-pipelined methodology
lives here once: ``groups`` groups of ``runs`` pipelined dispatches, ONE
blocking fetch per group (amortizes the tunnel round trip to <6%), report
per-group steps/sec; callers take the best group (under additive noise the
max estimates true program throughput at the noise floor).
"""
from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def headline_inputs(n: int = 2, t_len: int = 128, num_classes: int = 52670):
    """The headline harness input set (BASELINE.md shapes): batch n with CFG
    doubling, T=t_len, fixed seeds. Returns (z, o, c, y) plus the init args
    for model.init. `num_classes` sets the null label (= num_classes) so the
    harness also serves models with small label tables (e.g. toy-trained
    checkpoints in bench_accel --ckpt)."""
    from osu_diffusion_tpu import CONTEXT_SIZE

    z = jax.random.normal(jax.random.PRNGKey(1), (n, t_len, 2))
    o = jnp.cumsum(jnp.ones((n, t_len)) * 150, axis=1)
    c = jax.random.normal(jax.random.PRNGKey(2), (n, t_len, CONTEXT_SIZE))
    # CFG-doubling convention: first half real labels, second half null
    # (= num_classes), for ANY batch size — not just the headline n=2.
    y = jnp.asarray(
        [1] * (n // 2) + [num_classes] * (n - n // 2), dtype=jnp.int32
    )
    init_args = (
        jnp.zeros((n, t_len, 2)),
        jnp.zeros((n,), jnp.int32),
        jnp.zeros((n, t_len)),
        jnp.zeros((n, t_len, CONTEXT_SIZE)),
        jnp.zeros((n,), jnp.int32),
    )
    return z, o, c, y, init_args


def fetch_fence(out) -> None:
    """Force execution of `out`'s dependency cone by fetching one leaf.
    block_until_ready is NOT a reliable execution fence on the axon tunnel
    runtime (see measure_grouped); every bench warmup/fence goes through
    here."""
    import numpy as np

    # EVERY leaf: fetching only one leaf executes only that leaf's dependency
    # cone on this lazy runtime — independently-computed sibling outputs
    # would be left unexecuted (async-copy all, then drain).
    leaves = jax.tree.leaves(out)
    for leaf in leaves:
        if hasattr(leaf, "copy_to_host_async"):
            leaf.copy_to_host_async()
    for leaf in leaves:
        np.asarray(leaf).ravel()[:1]


def measure_grouped(
    dispatch: Callable[[int], jax.Array],
    steps: int,
    groups: int = 10,
    runs: int = 10,
) -> list[float]:
    """Grouped-pipelined throughput. ``dispatch(j)`` fires the j-th chain
    (j is the global dispatch index — use it to derive the PRNG key) and
    returns the result WITHOUT blocking; one VALUE FETCH per group. Returns
    chain-steps/sec per group.

    The fence is a fetch (device_get of one leaf per chain), not
    block_until_ready: on the axon tunnel runtime block_until_ready can
    return before the dispatch actually executes (measured round 4: a
    112 ms-ideal matmul chain "blocked" in 0.6 ms; fetching its value took
    the real time). EVERY chain in the group is fetched — on a lazy runtime
    fetching only the last chain could execute only that chain's dependency
    cone. The host copies are issued async first (copy_to_host_async), so
    the per-chain tunnel round trips overlap the remaining chains' compute
    instead of serializing after it; the sync np.asarray then just drains
    completed copies. ALL leaves of each dispatch result are fetched — by
    the same lazy-runtime rationale, fetching only the first leaf would
    under-fence a dispatch returning independently-computed arrays."""
    import numpy as np

    per_group = []
    for g in range(groups):
        start = time.perf_counter()
        leaves = [
            leaf
            for i in range(runs)
            for leaf in jax.tree.leaves(dispatch(g * runs + i))
        ]
        for leaf in leaves:
            leaf.copy_to_host_async()
        for leaf in leaves:
            np.asarray(leaf)
        per_group.append(steps * runs / (time.perf_counter() - start))
    return per_group
