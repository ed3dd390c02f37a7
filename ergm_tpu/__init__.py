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


def __getattr__(name):
    # lazy public API (keeps `import ergm_tpu` light; jax-heavy modules
    # load on first touch)
    import importlib

    lazy = {
        "forward": ("ergm_tpu.models.gpt2", "forward"),
        "init_params": ("ergm_tpu.models.gpt2", "init_params"),
        "generate": ("ergm_tpu.infer.generate", "generate"),
        "generate_batch": ("ergm_tpu.infer.generate", "generate_batch"),
        "beam_search": ("ergm_tpu.infer.beam", "beam_search"),
        "Trainer": ("ergm_tpu.train.trainer", "Trainer"),
        "Evaluator": ("ergm_tpu.evaluation.evaluate", "Evaluator"),
        "BPETokenizer": ("ergm_tpu.tokenizer.bpe", "BPETokenizer"),
    }
    if name in lazy:
        mod, attr = lazy[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'ergm_tpu' has no attribute {name!r}")
