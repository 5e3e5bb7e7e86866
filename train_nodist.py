#!/usr/bin/env python
"""Single-process "refine model" trainer.

Parity with reference train_nodist.py: the same training loop but with the
timestep draw pinned to t=0 (train_nodist.py:222 hardcodes
torch.randint(0, 1, ...)), producing the refine model consumed by
sample.py --refine-ckpt. Here it's the shared trainer with max_timestep=1;
all other flags flow through the shared train-CLI plumbing.
"""
from osu_diffusion_tpu.cli import build_train_parser, train_config_kwargs
from osu_diffusion_tpu.train.trainer import TrainConfig, train

if __name__ == "__main__":
    args = build_train_parser().parse_args()
    # reuse the shared arg plumbing, then pin the refine-mode timestep cap
    train(TrainConfig(**{**train_config_kwargs(args), "max_timestep": 1}))
