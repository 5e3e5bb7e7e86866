from osu_diffusion_tpu.diffusion.schedule import (
    get_named_beta_schedule,
    space_timesteps,
)
from osu_diffusion_tpu.diffusion.process import (
    GaussianDiffusion,
    create_diffusion,
)

__all__ = [
    "GaussianDiffusion",
    "create_diffusion",
    "get_named_beta_schedule",
    "space_timesteps",
]
