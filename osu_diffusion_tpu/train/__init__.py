from osu_diffusion_tpu.train.checkpoint import (
    load_torch_checkpoint,
    params_to_torch_state_dict,
    torch_state_dict_to_params,
)

__all__ = [
    "load_torch_checkpoint",
    "params_to_torch_state_dict",
    "torch_state_dict_to_params",
]
