"""osu-diffusion-tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework for training and
sampling class-conditional Diffusion Transformers over osu! beatmap coordinate
sequences.

This is a ground-up rebuild, designed TPU-first, with the same capabilities as the
reference CUDA/PyTorch implementation (OliBomby/osu-diffusion):

- L0  beatmap I/O            -> osu_diffusion_tpu.beatmap   (own .osu parser/writer;
                                the reference delegated this to the `slider` package)
- L1  feature pipeline       -> osu_diffusion_tpu.data
- L2  embedding primitives   -> osu_diffusion_tpu.ops.embeddings
- L3  DiT model              -> osu_diffusion_tpu.models.dit (flax.linen)
- L4  gaussian diffusion     -> osu_diffusion_tpu.diffusion  (pure-jnp, scan sampler)
- L5  train/sample drivers   -> osu_diffusion_tpu.train, cli entry points
- L6  beatmap export         -> osu_diffusion_tpu.export
- L7  eval / analysis        -> osu_diffusion_tpu.evals

Parallelism lives in osu_diffusion_tpu.parallel: a `jax.sharding.Mesh` over
("data", "model") with pjit-inferred collectives replaces the reference's
DDP/NCCL plumbing (reference train.py:106,152).
"""

__version__ = "0.1.0"

FEATURE_SIZE = 19  # parity: reference data_loading.py:29
PLAYFIELD = (512.0, 384.0)  # osu! standard playfield, reference data_loading.py:28
CONTEXT_SIZE = FEATURE_SIZE - 3 + 128  # 144: distance embed (128) + 16 type one-hots
