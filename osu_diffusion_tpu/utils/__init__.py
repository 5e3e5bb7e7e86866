from osu_diffusion_tpu.utils.logger import create_logger


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Persist compiled XLA executables across processes — first-compile of a
    DiT-B program costs minutes on tunneled runtimes, cached reloads are
    seconds. Safe no-op if the backend doesn't support it."""
    import os

    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            cache_dir or os.path.expanduser("~/.cache/osu_diffusion_tpu/xla"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


__all__ = ["create_logger", "enable_compilation_cache"]
