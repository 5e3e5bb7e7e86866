"""Training driver (L5).

Behavioral parity with reference train.py:99-303, TPU-native:
- torchrun/DDP/process-groups -> single-controller JAX over a ("data","model")
  mesh; per-host input sharding keyed on jax.process_index().
- fp16 autocast + GradScaler -> bf16 compute, fp32 params (no scaler).
- torch.save checkpoints -> orbax {params, ema, opt_state, step}, with
  auto-resume-latest (improves on the reference's fixed-path restart loop,
  train.sh:30-37) and optional torch-layout export.
- log format preserved ("Train Loss: x, Train Steps/Sec: y"), as the
  reference's plot_loss.py parses it.
"""
from __future__ import annotations

import dataclasses
import os
import time
from glob import glob

import jax
import jax.numpy as jnp
import numpy as np

from osu_diffusion_tpu import CONTEXT_SIZE
from osu_diffusion_tpu.data.dataset import BeatmapDatasetIterableFactory, get_data_loader
from osu_diffusion_tpu.diffusion import create_diffusion
from osu_diffusion_tpu.models import DiT_models
from osu_diffusion_tpu.parallel import (
    batch_sharding,
    make_mesh,
    make_train_step,
    shard_params,
)
from osu_diffusion_tpu.parallel.train_step import (
    create_train_state,
    make_optimizer,
)
from osu_diffusion_tpu.train import checkpoint as ckpt_lib
from osu_diffusion_tpu.utils.logger import create_logger


@dataclasses.dataclass
class TrainConfig:
    """Flag surface parity with reference train.py:306-336 (plus mesh/TPU
    options; booleans are real booleans, not the reference's `type=bool` trap)."""

    data_path: str
    num_classes: int = 52670
    data_start: int = 0
    data_end: int = 13402
    results_dir: str = "results"
    model: str = "DiT-B"
    epochs: int = 1400
    global_batch_size: int = 256
    global_seed: int = 0
    num_workers: int = 4
    log_every: int = 100
    ckpt_every: int = 50_000
    seq_len: int = 128
    stride: int = 16
    ckpt: str | None = None
    noise_schedule: str = "squaredcos_cap_v2"
    l1_loss: bool = True
    lr: float = 1e-4
    relearn_embeds: bool = False
    embed_only_epochs: int = 0
    # TPU-native additions
    num_model: int = 1  # tensor-parallel degree on the mesh "model" axis
    use_bf16: bool = True  # replaces --use-amp
    use_pallas: bool = False
    max_steps: int | None = None  # optional hard stop (tests/benchmarks)
    class_dropout_prob: float = 0.2  # parity: train.py:144
    steps_per_call: int = 8  # optimizer steps fused per device dispatch (scan)
    max_timestep: int | None = None  # cap timestep draw; 1 = refine-model mode
    augment: bool = True
    profile_dir: str | None = None  # write a jax.profiler trace of early steps
    profile_steps: int = 3  # device dispatches to capture
    multihost: bool = False  # call jax.distributed.initialize() (DCN across hosts)
    # adaLN-MLP kernel backward (use_pallas only): "xla" plain-jnp (measured
    # faster) or "fused" Pallas reduction/LN-backward kernels
    mlp_bwd: str = "xla"
    # which ops use_pallas fuses: "attn,mlp" / "attn" / "mlp" — mlp-only keeps
    # XLA dense attention (faster at short T; flash attention wins at long T)
    pallas_ops: str = "attn,mlp"
    scan_blocks: bool = False  # nn.scan over depth: 4.4x faster compiles, ~10% runtime cost
    # rematerialize each block in backward (jax.checkpoint). With use_pallas
    # the fused kernels' custom VJPs already store only block inputs + the
    # pre-GELU activation, so remat=False fits DiT-B batch-256 on a 16 GB chip
    # and skips the ~33% forward-recompute FLOPs.
    remat: bool = True
    # banded attention half-width for long-T fine-tuning (defaults to seq_len
    # when use_pallas — exactly full attention at T = seq_len)
    band: int | None = None
    # flash-attention kernel block size (q rows per program / key-window
    # stride). 128 is right for window-length training; 256 measured +2.5 MFU
    # points at T=1024 band=128 (PARITY.md "Long-T flash-backward
    # optimization"). Lane-aligned blocks also get the slim-stat backward
    # layout automatically (ops/pallas_attention.py SLIM_STATS_DEFAULT).
    flash_block: int = 128
    # context-parallel training: shard the attention sequence axis over the
    # mesh "model" axis (halo exchange, parallel/context.py). Requires a band
    # and seq_len divisible by num_model * 128.
    context_parallel: bool = False


def _embed_mask(params, trainable_embed_only: bool):
    def leaf_mask(path, _):
        is_embed = any(
            getattr(p, "key", "") == "embedding_table" for p in path
        )
        return is_embed if trainable_embed_only else True

    return jax.tree_util.tree_map_with_path(leaf_mask, params)


def train(config: TrainConfig) -> dict:
    """Run training; returns a small summary dict (final step, last loss)."""
    from osu_diffusion_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    if config.multihost:
        # single-controller multi-host: ICI inside a slice, DCN between hosts
        # (replaces torchrun rendezvous, reference train.py:106)
        jax.distributed.initialize()
    process_index = jax.process_index()
    num_processes = jax.process_count()
    rank0 = process_index == 0

    # experiment folder (parity train.py:119-138). The index is chosen on
    # process 0 and broadcast so EVERY process agrees on the checkpoint path:
    # orbax saves of sharded arrays require all processes to participate
    # (each host writes its local shards), so the save below is not rank0-gated.
    if rank0:
        os.makedirs(config.results_dir, exist_ok=True)
        experiment_index = len(glob(f"{config.results_dir}/*"))
    else:
        experiment_index = 0
    if num_processes > 1:
        from jax.experimental import multihost_utils

        experiment_index = int(
            multihost_utils.broadcast_one_to_all(np.int32(experiment_index))
        )
    model_string_name = config.model.replace("/", "-")
    experiment_dir = f"{config.results_dir}/{experiment_index:03d}-{model_string_name}"
    checkpoint_dir = f"{experiment_dir}/checkpoints"
    os.makedirs(checkpoint_dir, exist_ok=True)
    logger = create_logger(experiment_dir if rank0 else None, 0 if rank0 else 1)
    if rank0:
        logger.info(f"Experiment directory created at {experiment_dir}")

    n_devices = len(jax.devices())
    # a 1-device mesh still routes through the SPMD executable path, which on
    # some runtimes (the axon tunnel) costs seconds per dispatch — use plain
    # single-device execution unless there is actual parallelism
    use_mesh = n_devices > 1
    mesh = make_mesh(num_model=config.num_model) if use_mesh else None
    assert config.global_batch_size % max(1, n_devices // config.num_model) == 0, (
        "Batch size must be divisible by the data-parallel degree."
    )

    model = DiT_models[config.model](
        num_classes=config.num_classes,
        context_size=CONTEXT_SIZE,
        class_dropout_prob=config.class_dropout_prob,
        scan_blocks=config.scan_blocks,
        remat=config.remat,
        mlp_bwd=config.mlp_bwd,
        pallas_ops=config.pallas_ops,
        flash_block=config.flash_block,
    )
    diffusion = create_diffusion(
        timestep_respacing="",
        noise_schedule=config.noise_schedule,
        use_l1=config.l1_loss,
    )
    optimizer = make_optimizer(lr=config.lr, weight_decay=0.0)

    # init params
    t_len = config.seq_len
    init_rng = jax.random.PRNGKey(config.global_seed)
    variables = model.init(
        init_rng,
        jnp.zeros((1, t_len, 2)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, t_len)),
        jnp.zeros((1, t_len, CONTEXT_SIZE)),
        jnp.zeros((1,), jnp.int32),
    )
    params = variables["params"]
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    logger.info(f"DiT Parameters: {n_params:,}")

    # resume (parity train.py:203-221): torch .pt or orbax dir
    if config.ckpt is not None:
        if os.path.isfile(config.ckpt):
            # the converted tree must match the model's block layout
            # (scan_blocks stacks per-block tensors under one "blocks" scope)
            loaded = ckpt_lib.load_torch_checkpoint(
                config.ckpt, prefer_ema=False, scan_blocks=config.scan_blocks
            )
            ema_loaded = ckpt_lib.load_torch_checkpoint(
                config.ckpt, prefer_ema=True, scan_blocks=config.scan_blocks
            )
            if config.relearn_embeds:
                # keep the fresh table (parity train.py:212-217)
                loaded["y_embedder"] = params["y_embedder"]
                ema_loaded["y_embedder"] = params["y_embedder"]
            params = loaded
            if use_mesh:
                params = shard_params(params, mesh)
                ema_loaded = shard_params(ema_loaded, mesh)
            state = create_train_state(params, optimizer, mesh if use_mesh else None)
            state = state.replace(ema_params=ema_loaded)
            logger.info(f"Restored from torch checkpoint at {config.ckpt}")
        else:
            if use_mesh:
                params = shard_params(params, mesh)
            state = create_train_state(params, optimizer, mesh if use_mesh else None)
            state = ckpt_lib.restore_train_state(config.ckpt, state)
            logger.info(f"Restored from checkpoint at {config.ckpt}")
    else:
        if use_mesh:
            params = shard_params(params, mesh)
        state = create_train_state(params, optimizer, mesh if use_mesh else None)

    # data: per-process beatmap-set shard (parity train.py:164-170)
    per_rank = int(np.ceil((config.data_end - config.data_start) / float(num_processes)))
    ds_start = config.data_start + process_index * per_rank
    ds_end = min(ds_start + per_rank, config.data_end)
    batch_size = config.global_batch_size // num_processes
    loader = get_data_loader(
        dataset_path=config.data_path,
        start=ds_start,
        end=ds_end,
        iterable_factory=BeatmapDatasetIterableFactory(
            config.seq_len, config.stride, seed=config.global_seed + process_index
        ),
        cycle_length=max(1, batch_size // 2),
        batch_size=batch_size,
        num_workers=config.num_workers,
        shuffle=True,
        drop_last=True,
        seed=config.global_seed + process_index,
    )
    logger.info(
        f"Dataset contains {(ds_end - ds_start):,} beatmap sets ({config.data_path})"
    )

    from osu_diffusion_tpu.parallel.train_step import make_multi_train_step

    embed_only = config.embed_only_epochs > 0
    k = max(1, config.steps_per_call)
    compute_dtype = jnp.bfloat16 if config.use_bf16 else jnp.float32

    # band = seq_len at T = seq_len is exactly full attention (the band
    # q-L < k <= q+L covers [0, T) for every query), so training through the
    # flash kernel is mathematically the reference's unmasked training
    # attention; an explicit config.band narrows it for long-T fine-tuning
    band = config.band if config.band is not None else (
        config.seq_len if config.use_pallas else None
    )
    cp_mesh = None
    if config.context_parallel:
        assert band is not None, "context_parallel requires a band"
        assert use_mesh and config.num_model > 1, (
            "context_parallel shards the sequence over the mesh 'model' axis; "
            "need num_model > 1 and more than one device"
        )
        assert config.seq_len % (config.num_model * 128) == 0, (
            config.seq_len, config.num_model
        )
        cp_mesh = mesh

    def _jit_steps(trainable_mask=None):
        single = make_train_step(
            model, diffusion, optimizer, trainable_mask=trainable_mask,
            compute_dtype=compute_dtype, max_timestep=config.max_timestep,
            augment=config.augment, use_pallas=config.use_pallas,
            band=band, cp_mesh=cp_mesh,
        )
        return (
            jax.jit(single, donate_argnums=(0,)),
            jax.jit(make_multi_train_step(single, k), donate_argnums=(0,)),
        )

    step_fn, multi_fn = _jit_steps()
    step_fn_embed_only = multi_fn_embed_only = None
    if embed_only:
        step_fn_embed_only, multi_fn_embed_only = _jit_steps(_embed_mask(params, True))
        logger.info(
            f"Freezing non-embedding layers for {config.embed_only_epochs} epochs"
        )

    b_shard = batch_sharding(mesh) if use_mesh else None
    rng = jax.random.PRNGKey(config.global_seed * max(1, num_processes) + process_index)

    train_steps = int(state.step)
    log_steps = 0
    running_loss = 0.0
    start_time = time.time()
    last_avg_loss = float("nan")
    logger.info(f"Training for {config.epochs} epochs...")

    stop = False
    pending_metrics: list = []  # device arrays, synced only at log time
    profiling = config.profile_dir is not None
    profile_calls_left = config.profile_steps if profiling else 0
    if profiling:
        jax.profiler.start_trace(config.profile_dir)
        logger.info(f"Profiling first {config.profile_steps} dispatches to {config.profile_dir}")

    def _after_steps(n_steps, metrics):
        nonlocal train_steps, log_steps, running_loss, start_time, last_avg_loss, stop
        pending_metrics.append((n_steps, metrics["loss"]))
        log_steps += n_steps
        train_steps += n_steps
        if train_steps % config.log_every < n_steps:
            # drain pending device metrics (single sync point)
            total = sum(n * float(l) for n, l in pending_metrics)
            running_loss += total
            pending_metrics.clear()
            end_time = time.time()
            steps_per_sec = log_steps / (end_time - start_time)
            # loss is already globally averaged by the sharded mean
            last_avg_loss = running_loss / log_steps
            logger.info(
                f"(step={train_steps:07d}) Train Loss: {last_avg_loss:.4f}, "
                f"Train Steps/Sec: {steps_per_sec:.2f}"
            )
            running_loss = 0.0
            log_steps = 0
            start_time = time.time()
        if (
            train_steps % config.ckpt_every < n_steps
            and train_steps >= config.ckpt_every
        ):
            # ALL processes call the save: orbax writes each host's local
            # shards and rank 0 finalizes — a rank0-only call would deadlock
            # on sharded arrays (replaces the reference's rank0 torch.save +
            # dist.barrier, train.py:285-297)
            path = ckpt_lib.save_train_state(checkpoint_dir, state, train_steps)
            logger.info(f"Saved checkpoint to {path}")
        if config.max_steps is not None and train_steps >= config.max_steps:
            stop = True

    def _to_device(arrs, sharding):
        if not use_mesh:
            return arrs
        if num_processes == 1:
            return jax.device_put(arrs, sharding)
        # multi-host: each process holds only ITS rows of the global batch;
        # device_put of the local array onto the global sharding would shrink
        # the logical batch by num_processes (or reject non-addressable
        # devices) — assemble the global array from per-process shards
        return jax.tree.map(
            lambda a: jax.make_array_from_process_local_data(
                sharding, np.asarray(a)
            ),
            arrs,
        )

    def _stack_batches(items):
        wins = np.stack([b[0] for b in items])
        prevs = np.stack([b[1] for b in items])
        ys = np.stack([b[2] for b in items])
        return _to_device((wins, prevs, ys), b_shard_multi)

    from jax.sharding import NamedSharding, PartitionSpec as P
    import contextlib

    b_shard_multi = NamedSharding(mesh, P(None, "data")) if use_mesh else None

    with (mesh if use_mesh else contextlib.nullcontext()):
        # the microbatch buffer persists ACROSS epochs so the k-step scan fills
        # even when one epoch yields fewer than k batches (tiny datasets)
        buf: list = []

        def _flush_singles(active_single):
            nonlocal state
            for win, prev_xy, y in buf:
                if stop:
                    break
                batch = _to_device(
                    (np.asarray(win), np.asarray(prev_xy), np.asarray(y)), b_shard
                )
                state, metrics = active_single(state, batch, rng)
                _after_steps(1, metrics)
            buf.clear()

        for epoch in range(config.epochs):
            if stop:
                break
            logger.info(f"Beginning epoch {epoch}...")
            if embed_only and epoch == config.embed_only_epochs:
                # flush before the freeze boundary so one scan never mixes
                # frozen and unfrozen steps
                _flush_singles(step_fn_embed_only)
                logger.info("Un-freezing non-embedding layers")
                embed_only = False
            active_single = step_fn_embed_only if embed_only else step_fn
            active_multi = multi_fn_embed_only if embed_only else multi_fn
            for (win, prev_xy), y in loader:
                buf.append((win, prev_xy, y))
                if len(buf) == k:
                    state, metrics = active_multi(state, _stack_batches(buf), rng)
                    buf.clear()
                    if profiling and profile_calls_left > 0:
                        profile_calls_left -= 1
                        if profile_calls_left == 0:
                            jax.block_until_ready(metrics["loss"])
                            jax.profiler.stop_trace()
                            profiling = False
                            logger.info("Profiler trace written")
                    _after_steps(k, metrics)
                    if stop:
                        break
        # final remainder through the single step
        active_single = step_fn_embed_only if embed_only else step_fn
        _flush_singles(active_single)

    logger.info("Done!")
    return {
        "final_step": train_steps,
        "last_loss": last_avg_loss,
        "experiment_dir": experiment_dir,
        "state": state,
    }
