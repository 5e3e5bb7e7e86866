from osu_diffusion_tpu.export.create_beatmap import (
    create_beatmap,
    plot_beatmap,
    position_to_progress,
)

__all__ = ["create_beatmap", "plot_beatmap", "position_to_progress"]
