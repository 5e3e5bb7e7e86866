"""The jitted training step: loss, AdamW update, and EMA — one XLA program.

Replaces the reference hot loop (train.py:243-261):
- torch autocast fp16 + GradScaler -> bf16 matmuls on TPU, fp32 params and
  optimizer state; no loss scaling needed (SURVEY.md §7 design mapping).
- the per-parameter Python EMA loop (train.py:36-45) -> a fused
  jax.tree.map inside the same jitted step.
- DDP gradient all-reduce -> inferred collectives from batch sharding over the
  "data" mesh axis.
- host-side loader featurization -> device-side process_batch fused into the
  step (distance embed, flips, time randomization).

The uniform timestep draw (train.py:248) and the CFG label dropout
(models.py:56-67) consume explicit PRNG streams split from one step rng.
"""
from __future__ import annotations

from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax

from osu_diffusion_tpu.data.process import process_batch
from osu_diffusion_tpu.diffusion.process import GaussianDiffusion


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    ema_params: Any
    opt_state: Any


def create_train_state(
    params, optimizer: optax.GradientTransformation, mesh=None
) -> TrainState:
    """EMA starts as a copy of the weights (parity: train.py:194-198 update_ema
    with decay=0).

    When `mesh` is given, scalar leaves created here (step, the optimizer's
    count) are replicated over it so they are device-compatible with sharded
    params in one jitted computation."""
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        ema_params=jax.tree.map(jnp.copy, params),
        opt_state=optimizer.init(params),
    )
    if mesh is not None and mesh.devices.size > 1:
        from jax.sharding import NamedSharding, PartitionSpec

        rep = NamedSharding(mesh, PartitionSpec())

        def _fix(x):
            if isinstance(x, jax.Array) and len(x.sharding.device_set) == 1:
                return jax.device_put(x, rep)
            return x

        state = jax.tree.map(_fix, state)
    return state


def make_optimizer(lr: float = 1e-4, weight_decay: float = 0.0) -> optax.GradientTransformation:
    """AdamW, defaults matching the reference (train.py:161: lr=1e-4, wd=0,
    betas=(0.9, 0.999))."""
    return optax.adamw(lr, b1=0.9, b2=0.999, weight_decay=weight_decay)


def make_train_step(
    model,
    diffusion: GaussianDiffusion,
    optimizer: optax.GradientTransformation,
    ema_decay: float = 0.9999,
    augment: bool = True,
    compute_dtype: jnp.dtype = jnp.bfloat16,
    trainable_mask: Any = None,
    max_timestep: int | None = None,
    use_pallas: bool = False,
    band: int | None = None,
    cp_mesh=None,
    cp_axis: str = "model",
) -> Callable:
    """Build the jittable train step.

    batch = (raw, prev_xy, y): raw (N, T, 19) windows, prev_xy (N, 2), labels.
    `trainable_mask`: optional pytree of {True,False} matching params — False
    entries get zero updates (the reference's embedding-freeze flows,
    train.py:56-63,223-241).
    `max_timestep`: cap the uniform timestep draw; max_timestep=1 trains only
    t=0, producing the "refine model" (parity: train_nodist.py:222).
    `cp_mesh`/`cp_axis`: context-parallel training — shard the sequence axis
    of attention over the mesh axis with halo exchange (requires `band`; T
    must divide axis_size * 128). Long banded sequences beyond one chip's
    memory can then be TRAINED, not just sampled (parallel/context.py).
    Returns (new_state, metrics) with metrics {loss, l1|mse, vb}.
    """
    if cp_mesh is not None:
        assert band is not None, "context-parallel training requires a band"

    def train_step(state: TrainState, batch, rng: jax.Array):
        raw, prev_xy, y = batch
        rng = jax.random.fold_in(rng, state.step)
        proc_rng, t_rng, noise_rng, drop_rng = jax.random.split(rng, 4)

        x, o, c = process_batch(raw, prev_xy, proc_rng, augment=augment)
        n = x.shape[0]
        t_hi = diffusion.num_timesteps if max_timestep is None else max_timestep
        t = jax.random.randint(t_rng, (n,), 0, t_hi)
        noise = jax.random.normal(noise_rng, x.shape, jnp.float32)

        def loss_fn(params):
            def model_fn(xt, tt, **kw):
                # inputs stay f32 (positions/offsets feed high-frequency
                # sincos embeddings — quantizing them to bf16 first loses
                # ~2 px / ~512 ms); the residual stream runs in compute_dtype
                out = model.apply(
                    {"params": params},
                    xt,
                    tt,
                    o,
                    c,
                    y,
                    train=True,
                    band=band,
                    use_pallas=use_pallas,
                    cp_mesh=cp_mesh,
                    cp_axis=cp_axis,
                    dtype=compute_dtype,
                    rngs={"label_dropout": drop_rng},
                )
                return out.astype(jnp.float32)

            terms = diffusion.training_losses(model_fn, x, t, noise)
            return terms["loss"].mean(), terms

        (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        if trainable_mask is not None:
            grads = jax.tree.map(
                lambda g, m: g if m else jnp.zeros_like(g), grads, trainable_mask
            )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if trainable_mask is not None:
            params = jax.tree.map(
                lambda new, old, m: new if m else old, params, state.params,
                trainable_mask,
            )
        # EMA fused into the step (vs reference Python loop train.py:36-45)
        ema_params = jax.tree.map(
            lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
            state.ema_params,
            params,
        )
        new_state = TrainState(
            step=state.step + 1,
            params=params,
            ema_params=ema_params,
            opt_state=opt_state,
        )
        metrics = {"loss": loss}
        for k in ("l1", "mse", "vb"):
            if k in terms:
                metrics[k] = terms[k].mean()
        return new_state, metrics

    return train_step


def make_multi_train_step(single_step: Callable, k: int) -> Callable:
    """Wrap a train step in a lax.scan over k stacked microbatches.

    One device dispatch then runs k optimizer steps — essential on dispatch-
    latency-bound links (the axon TPU tunnel costs ~1-2s per jit call; the
    reference's per-step Python loop train.py:243 would be dispatch-bound the
    same way). `batches` leaves carry a leading (k, ...) axis; the per-step rng
    distinctness comes from the fold-in on state.step inside the single step.

    Returns (final_state, metrics) with metrics averaged over the k steps.
    """

    def multi_step(state: TrainState, batches, rng: jax.Array):
        def body(s, b):
            s2, m = single_step(s, b, rng)
            return s2, m

        state, ms = jax.lax.scan(body, state, batches, length=k)
        return state, jax.tree.map(lambda a: a.mean(), ms)

    return multi_step
