from osu_diffusion_tpu.utils.logger import create_logger

__all__ = ["create_logger"]
