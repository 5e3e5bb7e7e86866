#!/usr/bin/env python
"""Generate beatmap coordinates from a trained DiT checkpoint. Flag surface
mirrors the reference sample.py:208-236; see osu_diffusion_tpu/cli.py."""
from osu_diffusion_tpu.cli import build_sample_parser, sample_main

if __name__ == "__main__":
    sample_main(build_sample_parser().parse_args())
