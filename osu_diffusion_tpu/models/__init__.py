from osu_diffusion_tpu.models.dit import (
    DiT,
    DiT_models,
    DiTConfig,
)

__all__ = ["DiT", "DiTConfig", "DiT_models"]
