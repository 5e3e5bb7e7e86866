#!/usr/bin/env python
"""CLI-surface wrapper matching the reference testing/create_beatmap_dataframe.py (see
osu_diffusion_tpu/evals/tooling.py for the subcommand forms)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from osu_diffusion_tpu.evals.tooling import main

if __name__ == "__main__":
    main()
