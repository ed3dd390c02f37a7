"""ERGM-TPU: a TPU-native empathetic response generation framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the ERGM
reference (multimodal empathetic dialogue response generation with a
modified GPT-2 backbone: caption cross-attention, audio/visual feature
injection, and joint 7-way emotion classification), built TPU-first:

- pure-functional model code compiled once under ``jax.jit`` / ``pjit``
- SPMD scaling over ``jax.sharding.Mesh`` (data/model axes) with XLA
  collectives over ICI
- Pallas flash-attention kernels for the attention hot loops
- bf16 compute with fp32 softmax/loss, ``jax.checkpoint`` rematerialisation
- static shapes everywhere (padded batches, fixed-size KV cache decode)

Reference capability map: see SURVEY.md at the repo root.
"""

__version__ = "0.1.0"

from ergm_tpu.core.config import ModelConfig, TrainConfig  # noqa: F401
from ergm_tpu.core.tokens import SpecialTokens  # noqa: F401
