#!/usr/bin/env python
"""Single-process "refine model" trainer.

Parity with reference train_nodist.py: the same training loop but with the
timestep draw pinned to t=0 (train_nodist.py:222 hardcodes
torch.randint(0, 1, ...)), producing the refine model consumed by
sample.py --refine-ckpt. Here it's the shared trainer with max_timestep=1.
"""
from osu_diffusion_tpu.cli import build_train_parser
from osu_diffusion_tpu.train.trainer import TrainConfig, train

if __name__ == "__main__":
    parser = build_train_parser()
    args = parser.parse_args()
    from osu_diffusion_tpu.cli import train_main

    # reuse the shared arg plumbing, then pin the refine-mode timestep cap
    config_kwargs = dict(
        data_path=args.data_path,
        num_classes=args.num_classes,
        data_start=args.data_start,
        data_end=args.data_end,
        results_dir=args.results_dir,
        model=args.model,
        epochs=args.epochs,
        global_batch_size=args.global_batch_size,
        global_seed=args.global_seed,
        num_workers=args.num_workers,
        log_every=args.log_every,
        ckpt_every=args.ckpt_every,
        seq_len=args.seq_len,
        stride=args.stride,
        ckpt=args.ckpt,
        noise_schedule=args.noise_schedule,
        l1_loss=args.l1_loss,
        lr=args.lr,
        relearn_embeds=args.relearn_embeds,
        embed_only_epochs=args.embed_only_epochs,
        num_model=args.num_model,
        use_bf16=args.use_bf16,
        use_pallas=args.use_pallas,
        max_steps=args.max_steps,
        steps_per_call=args.steps_per_call,
        max_timestep=1,
    )
    train(TrainConfig(**config_kwargs))
