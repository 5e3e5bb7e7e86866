"""High-level sampling drivers: whole denoising chains as single jitted XLA
programs, with CFG, banded attention, length bucketing, and in-painting.

Replaces the reference sample-time flow (sample.py:76-205, test_toy.py:32-76):
there each of the 250-1000 denoise steps is a separate Python-dispatched model
call; here `Sampler` jit-compiles diffusion.p_sample_loop (a lax.scan) once per
(batch, length-bucket) and the full chain runs on-device.

Length bucketing: sequences are padded to a multiple of `bucket` (default 128)
so arbitrary beatmap lengths reuse a small set of compiled programs. Padded
keys are excluded from attention via the valid-length mask; padded rows are
sliced off the result.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from osu_diffusion_tpu.diffusion.process import GaussianDiffusion
from osu_diffusion_tpu.models.dit import DiT
from osu_diffusion_tpu.ops.attention import banded_attention_mask


def _bucketed(t: int, bucket: int) -> int:
    return max(bucket, -(-t // bucket) * bucket)


def _pad_time(a: jnp.ndarray, t_pad: int) -> jnp.ndarray:
    t = a.shape[1]
    if t == t_pad:
        return a
    widths = [(0, 0), (0, t_pad - t)] + [(0, 0)] * (a.ndim - 2)
    return jnp.pad(a, widths)


class Sampler:
    """Classifier-free-guidance ancestral sampler.

    Call convention mirrors the reference setup (sample.py:95-108): inputs are
    the CFG-doubled batch [cond | uncond] along axis 0; the eps-only guidance
    happens inside DiT.forward_with_cfg (models.py:327-343).
    """

    def __init__(
        self,
        model: DiT,
        diffusion: GaussianDiffusion,
        cfg_scale: float = 1.0,
        band: int | None = None,
        use_pallas: bool = False,
        bucket: int = 128,
        clip_denoised: bool = True,
        method: str = "ancestral",  # or "ddim"
        cp_mesh=None,
        cp_axis: str = "model",
        compute_dtype=jnp.float32,
        accel_interval: int = 1,
        accel_span: tuple[int, int] | None = None,
        accel_tau: float | None = None,
        accel_max_skip: int = 7,
        accel_drift: str = "global",
    ):
        """`cp_mesh`/`cp_axis`: context parallelism — shard the sequence over
        the mesh axis for lengths beyond one chip (parallel/context.py).
        Requires `band`; the length bucket is raised to axis_size * 128 so
        every compiled shape divides evenly across shards.

        `compute_dtype`: model-stream dtype. f32 (default) preserves exact
        output parity with the reference harness; bf16 halves activation
        traffic for faster serving (the diffusion chain itself — coefficient
        math, clamping, noise — always runs f32; only the DiT forward drops
        precision, and its head returns f32 either way).

        `accel_interval`/`accel_span`: Δ-cache accelerated sampling (opt-in,
        approximate — Δ-DiT arXiv:2406.01125 / BlockDance arXiv:2503.15927
        style cross-step feature reuse; no reference equivalent). Every
        `accel_interval`-th denoise step (and the final step) runs the full
        model and records the residual contribution Δ of the middle block
        span [lo, hi); the steps in between skip those blocks and reuse Δ.
        interval=1 (default) is exact sampling. `accel_span` defaults to the
        middle two-thirds of the depth. Requires the unrolled block layout
        (model built with scan_blocks=False).

        `accel_tau`: ADAPTIVE Δ-cache — instead of the fixed every-k
        schedule, the skip decision is error-driven: a step reuses the
        cached Δ while the relative drift of the model input since the last
        recorded step, ||x - x_ref|| / ||x_ref||, stays below tau; it
        re-records otherwise (plus on the final step, and after
        `accel_max_skip` consecutive skips as a timestep-staleness cap —
        Δ depends on t too, and adjacent-step similarity decays with
        distance). Early chain steps barely move x, so the schedule
        naturally skips deep there and runs full steps near t=0, where
        detail forms. Setting accel_tau enables adaptive mode regardless of
        accel_interval.

        `accel_drift`: how per-batch-row drifts reduce to the ONE skip
        decision a single batched trace permits — "global" (default) is the
        norm over the whole batch (one drifting variant is diluted by
        1/sqrt(N), so the batch keeps skipping); "per_sample_max" takes the
        max of per-row relative drifts (one drifting variant forces a full
        step for everyone — strictly more conservative). TRUE per-row
        decisions are structurally impossible here: the skip is a lax.cond
        between two whole-batch model traces, and running the full depth
        for one row only would mean running it for all
        (PARITY.md "Adaptive Δ-cache drift coupling"). After a call, `last_full_model_steps` holds the
        number of full model evaluations as a device scalar (fetch it to
        report the effective interval; it is NOT fetched internally so
        pipelined benchmarking stays non-blocking)."""
        self.model = model
        self.diffusion = diffusion
        self.cfg_scale = float(cfg_scale)
        self.band = band
        self.use_pallas = use_pallas
        self.cp_mesh = cp_mesh
        self.cp_axis = cp_axis
        if cp_mesh is not None:
            assert band is not None, "context parallelism requires a band"
            # round UP to a multiple of axis_size * 128 (not just a lower
            # bound): every compiled shape must divide evenly across shards,
            # e.g. a user bucket of 384 with 2 shards would otherwise pass
            # here and trip the trace-time divisibility check in
            # context_parallel_banded_attention
            step = cp_mesh.shape[cp_axis] * 128
            bucket = -(-max(bucket, 1) // step) * step
        self.bucket = bucket
        self.clip_denoised = clip_denoised
        self.compute_dtype = compute_dtype
        self.accel_interval = int(accel_interval)
        self.accel_tau = None if accel_tau is None else float(accel_tau)
        self.accel_max_skip = int(accel_max_skip)
        if accel_drift not in ("global", "per_sample_max"):
            raise ValueError(f"unknown accel_drift: {accel_drift}")
        self.accel_drift = accel_drift
        self.accel = self.accel_interval > 1 or self.accel_tau is not None
        self.last_full_model_steps = None
        if self.accel:
            if cp_mesh is not None:
                raise ValueError(
                    "Δ-cache sampling is not supported with context "
                    "parallelism (the Δ carry is per-device state)"
                )
            depth = model.config.depth
            if model.config.scan_blocks:
                raise ValueError(
                    "Δ-cache sampling needs the unrolled block layout: build "
                    "the model with scan_blocks=False (restore_params_any "
                    "converts checkpoints between layouts)"
                )
            if accel_span is None:
                accel_span = (depth // 6, depth - depth // 6)
            lo, hi = accel_span
            if not (0 <= lo < hi <= depth):
                raise ValueError(f"accel_span {accel_span} outside depth {depth}")
        self.accel_span = accel_span
        if method not in ("ancestral", "ddim"):
            raise ValueError(f"unknown sampling method: {method}")
        self.method = method
        self._cache: dict[tuple, Callable] = {}

    # -- compiled program per (N, T_pad, inpaint, use_cfg) -------------------

    def _build(
        self, n: int, t_pad: int, inpaint: bool, use_cfg: bool
    ) -> Callable:
        """use_cfg=False is the plain-forward variant (used by the toy evals
        which sample with the null class and no guidance, test_toy.py:65-74).

        The real (unpadded) length is a TRACED argument of the compiled
        function — the Pallas kernels take it as an SMEM operand and the XLA
        path folds it into the mask as a traced comparison — so one program
        serves every beatmap length within a bucket (the reference's
        per-length mask is free, sample.py:82-84; recompiling a DiT per
        length would be strictly worse)."""
        band = self.band
        cp = self.cp_mesh is not None
        use_pallas = self.use_pallas and band is not None
        mask = None
        if not use_pallas and not cp:
            if band is not None:
                mask = banded_attention_mask(t_pad, band)
            else:
                mask = jnp.ones((t_pad, t_pad), dtype=bool)

        dtype = self.compute_dtype

        def sample(params, z, o, c, y, rng, known_x, known_mask, valid_len):
            def model_fn(x, t, **kw):
                # x/o/c stay f32 into the model (sincos precision); only the
                # residual stream runs in compute_dtype
                kwargs = dict(
                    attn_mask=mask,
                    band=band if (use_pallas or cp) else None,
                    use_pallas=use_pallas,
                    valid_len=valid_len,
                    cp_mesh=self.cp_mesh,
                    cp_axis=self.cp_axis,
                    dtype=dtype,
                )
                if use_cfg:
                    kwargs.update(
                        cfg_scale=self.cfg_scale, method=DiT.forward_with_cfg
                    )
                out = self.model.apply({"params": params}, x, t, o, c, y, **kwargs)
                return out.astype(jnp.float32)

            denoised_fn = None
            if inpaint:
                denoised_fn = lambda x0: jnp.where(known_mask, x0, known_x)

            loop = (
                self.diffusion.ddim_sample_loop
                if self.method == "ddim"
                else self.diffusion.p_sample_loop
            )
            return loop(
                model_fn,
                z.shape,
                rng,
                noise=z,
                clip_denoised=self.clip_denoised,
                denoised_fn=denoised_fn,
            )

        if self.accel:
            return jax.jit(
                self._accel_sample_fn(n, t_pad, inpaint, use_cfg, mask)
            )
        return jax.jit(sample)

    def _accel_sample_fn(
        self, n: int, t_pad: int, inpaint: bool, use_cfg: bool, mask
    ) -> Callable:
        """Δ-cache accelerated chain: the Sampler runs its own lax.scan over
        diffusion.p_sample/ddim_sample steps, carrying (x, Δ, x_ref, skips,
        n_full). Each step is a lax.cond between two static model traces —
        "record" (full depth, emits a fresh Δ over `accel_span`) and "apply"
        (front + Δ + back; the span's blocks never execute).

        The skip schedule is data either way: in fixed mode a precomputed
        flag per chain position (full every `accel_interval`-th step and on
        the final step, where detail forms); in adaptive mode (`accel_tau`)
        the flag is computed online from the input drift since the last
        record, so the decision is error-driven (VERDICT r3 item 5)."""
        band = self.band
        use_pallas = self.use_pallas and band is not None
        dtype = self.compute_dtype
        span = self.accel_span
        hidden = self.model.config.hidden_size
        diffusion = self.diffusion
        s = diffusion.num_timesteps
        adaptive = self.accel_tau is not None
        tau = self.accel_tau
        max_skip = self.accel_max_skip
        if adaptive:
            flags = jnp.zeros((s,), bool)  # unused lane; decision is online
        else:
            flags = np.arange(s) % self.accel_interval != 0
            flags[-1] = False  # final step always full
            flags = jnp.asarray(flags)

        def sample(params, z, o, c, y, rng, known_x, known_mask, valid_len):
            def run_model(x, t, delta, delta_mode):
                kwargs = dict(
                    attn_mask=mask,
                    band=band if use_pallas else None,
                    use_pallas=use_pallas,
                    valid_len=valid_len,
                    dtype=dtype,
                    delta_mode=delta_mode,
                    delta_span=span,
                    delta=delta,
                )
                if use_cfg:
                    kwargs.update(
                        cfg_scale=self.cfg_scale, method=DiT.forward_with_cfg
                    )
                out, new_delta = self.model.apply(
                    {"params": params}, x, t, o, c, y, **kwargs
                )
                return out.astype(jnp.float32), new_delta.astype(dtype)

            denoised_fn = None
            if inpaint:
                denoised_fn = lambda x0: jnp.where(known_mask, x0, known_x)

            step_fn = (
                diffusion.ddim_sample
                if self.method == "ddim"
                else diffusion.p_sample
            )
            steps = jnp.arange(s - 1, -1, -1)
            rngs = jax.random.split(rng, s)
            delta0 = jnp.zeros((n, t_pad, hidden), dtype)
            # x_ref starts at zeros: first-step drift is ||z||/eps -> record
            xref0 = jnp.zeros_like(z)

            def body(carry, xs):
                x, delta, x_ref, skips, n_full = carry
                i, r, flag = xs
                if adaptive:
                    # reuse Δ while the model input has drifted little since
                    # the last record; re-record on drift, staleness (the
                    # cached Δ also ages in t), or the final step. n_full > 0
                    # guards the first step: a zero Δ must never be applied,
                    # however large tau is
                    if self.accel_drift == "per_sample_max":
                        # max of per-row relative drifts: one drifting
                        # variant forces a full step for the whole batch
                        # (the single batched trace permits only one skip
                        # decision; see the accel_drift docstring)
                        drift = jnp.max(
                            jnp.linalg.norm(
                                (x - x_ref).reshape(x.shape[0], -1), axis=1
                            ) / jnp.maximum(
                                jnp.linalg.norm(
                                    x_ref.reshape(x.shape[0], -1), axis=1
                                ), 1e-6
                            )
                        )
                    else:
                        drift = jnp.linalg.norm(x - x_ref) / jnp.maximum(
                            jnp.linalg.norm(x_ref), 1e-6
                        )
                    skip = (
                        (drift <= tau) & (skips < max_skip) & (i > 0)
                        & (n_full > 0)
                    )
                else:
                    skip = flag
                t = jnp.full((n,), i, dtype=jnp.int32)
                # p_sample/ddim_sample call model_fn exactly once, so the new
                # Δ can ride out through a closure cell
                cell = {}

                def model_fn(xx, tt):
                    out, new_delta = jax.lax.cond(
                        skip,
                        lambda op: run_model(op[0], tt, op[1], "apply"),
                        lambda op: run_model(op[0], tt, op[1], "record"),
                        (xx, delta),
                    )
                    cell["delta"] = new_delta
                    return out

                out = step_fn(
                    model_fn, x, t, r, clip_denoised=self.clip_denoised,
                    denoised_fn=denoised_fn,
                )
                assert "delta" in cell, "model_fn was never called"
                new_carry = (
                    out["sample"],
                    cell["delta"],
                    jnp.where(skip, x_ref, x),
                    jnp.where(skip, skips + 1, 0),
                    n_full + jnp.where(skip, 0, 1),
                )
                return new_carry, None

            (final, _, _, _, n_full), _ = jax.lax.scan(
                body,
                (z, delta0, xref0, jnp.int32(0), jnp.int32(0)),
                (steps, rngs, flags),
            )
            return final, n_full

        return sample

    # -- public API ----------------------------------------------------------

    def __call__(
        self,
        params: Any,
        z: jnp.ndarray,
        o: jnp.ndarray,
        c: jnp.ndarray,
        y: jnp.ndarray,
        rng: jax.Array,
        known_x: jnp.ndarray | None = None,
        known_mask: jnp.ndarray | None = None,
        use_cfg: bool = True,
    ) -> jnp.ndarray:
        """z: (N, T, 2) initial noise; o: (N, T); c: (N, T, 144); y: (N,).
        With CFG, N must be even ([cond | uncond]). Returns (N, T, 2)."""
        n, t_real = z.shape[0], z.shape[1]
        t_pad = _bucketed(t_real, self.bucket)
        inpaint = known_x is not None
        key = (n, t_pad, inpaint, use_cfg)
        if key not in self._cache:
            self._cache[key] = self._build(n, t_pad, inpaint, use_cfg)
        fn = self._cache[key]

        zp = _pad_time(z, t_pad)
        op = _pad_time(o, t_pad)
        cp = _pad_time(c, t_pad)
        if inpaint:
            kx = _pad_time(known_x, t_pad)
            km = _pad_time(known_mask.astype(jnp.bool_), t_pad)
        else:
            kx = jnp.zeros_like(zp)
            km = jnp.zeros(zp.shape, dtype=jnp.bool_)
        out = fn(params, zp, op, cp, y, rng, kx, km, jnp.int32(t_real))
        if self.accel:
            # device scalar, NOT fetched here (keeps pipelined dispatch
            # non-blocking); callers may int() it to report the skip rate
            out, self.last_full_model_steps = out
        return out[:, :t_real, :]


def prepare_cfg_inputs(
    seq_x: np.ndarray,
    seq_o: np.ndarray,
    seq_c: np.ndarray,
    class_labels: list[int],
    num_classes: int,
    rng: jax.Array,
):
    """Build the CFG-doubled sampling inputs from one processed sequence.
    Parity with the setup in sample.py:95-108: n variants of fresh noise, the
    sequence context repeated, labels [given | null]."""
    n = len(class_labels)
    t = seq_o.shape[-1] if seq_o.ndim == 1 else seq_o.shape[1]
    z = jax.random.normal(rng, (n, t, 2), jnp.float32)
    o = jnp.broadcast_to(jnp.asarray(seq_o).reshape(1, t), (n, t))
    c = jnp.broadcast_to(
        jnp.asarray(seq_c).reshape(1, t, -1), (n, t, seq_c.shape[-1])
    )
    z = jnp.concatenate([z, z], axis=0)
    o = jnp.concatenate([o, o], axis=0)
    c = jnp.concatenate([c, c], axis=0)
    y = jnp.asarray(list(class_labels) + [num_classes] * n, dtype=jnp.int32)
    return z, o, c, y
