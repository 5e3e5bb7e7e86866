#!/usr/bin/env python
"""Train a DiT on osu! beatmaps (TPU-native). Flag surface mirrors the
reference train.py:306-336; see osu_diffusion_tpu/train/trainer.py."""
from osu_diffusion_tpu.cli import build_train_parser, train_main

if __name__ == "__main__":
    train_main(build_train_parser().parse_args())
