from osu_diffusion_tpu.ops.embeddings import (
    offset_sequence_embedding,
    position_sequence_embedding,
    timestep_embedding,
)
from osu_diffusion_tpu.ops.attention import banded_attention_mask, multi_head_attention

__all__ = [
    "timestep_embedding",
    "offset_sequence_embedding",
    "position_sequence_embedding",
    "banded_attention_mask",
    "multi_head_attention",
]
