#!/usr/bin/env python
"""CLI-surface wrapper matching the reference testing/distance_distance.py."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from osu_diffusion_tpu.evals.distances import main

if __name__ == "__main__":
    main()
