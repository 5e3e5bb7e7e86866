#!/usr/bin/env python
"""CLI-surface wrapper matching the reference testing/unfuck_pattern.py."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from osu_diffusion_tpu.evals.unfuck import main

if __name__ == "__main__":
    main()
