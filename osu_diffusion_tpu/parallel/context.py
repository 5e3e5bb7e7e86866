"""Context-parallel (sequence-sharded) banded attention over a mesh axis.

A capability BEYOND the reference: its only long-sequence mechanism is the
banded mask on one device (reference sample.py:82-84, README.md:155-159),
so a marathon beatmap's full sequence must fit one chip. Here the sequence
axis is sharded over the mesh and the band structure makes the communication
a *halo exchange* rather than a ring: query rows on one shard can only attend
keys within `band` positions, so each shard needs exactly the last/first
`halo = ceil(band/block)*block` key/value rows of its two neighbors —
two `ppermute` hops on ICI, O(band) bytes, independent of T.

Design notes (TPU-native):
- jax.lax.ppermute with an incomplete permutation fills missing sources with
  zeros, which gives edge shards a zero halo for free; correctness does not
  rely on that, because the invalid halo is masked: the Pallas kernel takes a
  DYNAMIC valid-key range (ops/pallas_attention.banded_flash_attention_ranged)
  since shard position is a traced value inside shard_map.
- Everything else in the transformer is elementwise or dense over the feature
  axis, so under jit the sequence sharding propagates through the whole model
  untouched; attention is the only op that needs this halo exchange.
- DIFFERENTIABLE (round 3): shard_map/ppermute transpose automatically, the
  dense local path is plain XLA, and the ranged Pallas kernel carries a
  custom VJP with the same dynamic bounds — so long-T banded TRAINING can
  shard the sequence axis too (grad-parity tested against the single-device
  dense path on the virtual 8-device mesh; see make_train_step(cp_mesh=...)).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from osu_diffusion_tpu.ops.attention import dot_product_attention

DEFAULT_BLOCK = 128


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _neighbor_halos(x: jnp.ndarray, axis: str, halo: int, p: int):
    """(left_halo, right_halo) of x (N, H, T_loc, Dh) from the two neighbor
    shards on `axis`. Missing neighbors (edge shards) yield zeros."""
    # left halo = left neighbor's last rows: every shard i sends to i+1
    left = jax.lax.ppermute(
        x[:, :, -halo:, :], axis, [(i, i + 1) for i in range(p - 1)]
    )
    # right halo = right neighbor's first rows: every shard i sends to i-1
    right = jax.lax.ppermute(
        x[:, :, :halo, :], axis, [(i, i - 1) for i in range(1, p)]
    )
    return left, right


def _local_banded_attention(
    q, k, v, *, band: int, axis: str, p: int, block: int, use_pallas: bool,
    t_global_real: int | None, matmul_dtype,
):
    """Per-shard body (runs inside shard_map). q/k/v: (N, H, T_loc, Dh)."""
    n, h, t_loc, dh = q.shape
    halo = _cdiv(band, block) * block
    assert t_loc % block == 0, (t_loc, block)
    assert halo <= t_loc, (
        f"halo {halo} exceeds local length {t_loc}; use fewer shards or a "
        f"smaller band"
    )
    idx = jax.lax.axis_index(axis)

    k_left, k_right = _neighbor_halos(k, axis, halo, p)
    v_left, v_right = _neighbor_halos(v, axis, halo, p)
    k_ext = jnp.concatenate([k_left, k, k_right], axis=2)  # (N,H,T_loc+2*halo,Dh)
    v_ext = jnp.concatenate([v_left, v, v_right], axis=2)
    t_ext = t_loc + 2 * halo

    # dynamic valid-key range in extended coords: edge shards mask the halo
    # they have no neighbor for; the global tail mask (padded sequence) lands
    # on whichever shard holds row t_global_real-1
    k_lo = jnp.where(idx == 0, halo, 0)
    k_hi = jnp.where(idx == p - 1, halo + t_loc, t_ext)
    if t_global_real is not None:
        # extended-coord index of global key g on this shard: g - idx*t_loc + halo
        k_hi = jnp.minimum(k_hi, t_global_real - idx * t_loc + halo)

    if use_pallas:
        from osu_diffusion_tpu.ops.pallas_attention import (
            banded_flash_attention_ranged,
        )

        # pad q by `halo` on both sides so query row i sits at extended index
        # i + halo — then the kernel's band formula q - L < k <= q + L holds
        # verbatim in extended coords; the pad rows are sliced off after.
        # q_lo/q_hi bound the real query rows for the backward kernels (the
        # ranged kernel is differentiable; grads for k/v halos flow back to
        # the neighbor shards through ppermute's own transpose).
        q_ext = jnp.pad(q, [(0, 0), (0, 0), (halo, halo), (0, 0)])
        out = banded_flash_attention_ranged(
            q_ext, k_ext, v_ext, band, k_lo, k_hi, block=block,
            matmul_dtype=matmul_dtype, q_lo=halo, q_hi=halo + t_loc,
        )
        return out[:, :, halo : halo + t_loc, :]

    # XLA fallback (CPU tests / no-Pallas): dense (T_loc, T_ext) local mask
    qi = jnp.arange(t_loc)[:, None] + halo  # extended coords
    ki = jnp.arange(t_ext)[None, :]
    mask = (ki > qi - band) & (ki <= qi + band) & (ki >= k_lo) & (ki < k_hi)
    return dot_product_attention(q, k_ext, v_ext, mask)


def context_parallel_banded_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    band: int,
    mesh: Mesh,
    axis: str = "model",
    block: int = DEFAULT_BLOCK,
    use_pallas: bool = False,
    valid_len: int | None = None,
    matmul_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Banded attention with the sequence axis sharded over mesh `axis`.

    q/k/v: (N, H, T, Dh) with T divisible by axis_size * block (the Sampler's
    length bucketing guarantees this when bucket = axis_size * block).
    `valid_len`: real length when T is padded. Exact same semantics as
    ops.attention.banded_attention_mask / banded_flash_attention on one device.
    """
    from jax import shard_map

    p = mesh.shape[axis]
    t = q.shape[2]
    assert t % (p * block) == 0, (t, p, block)
    spec = P(None, None, axis, None)
    body = functools.partial(
        _local_banded_attention, band=band, axis=axis, p=p, block=block,
        use_pallas=use_pallas, matmul_dtype=matmul_dtype,
        # valid_len may be traced (compile-once-per-bucket contract); when it
        # equals t the k_hi minimum is a numeric no-op, so no Python compare
        t_global_real=valid_len,
    )
    f = shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )
    return f(q, k, v)
