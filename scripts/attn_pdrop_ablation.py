"""Quality ablation: attention-probability dropout 0.1 vs 0.0.

Context (VERDICT r2 #1): the reference trains with attn_pdrop=0.1 (HF
default; reference src/model.py:101,142), but attention-prob dropout
disqualifies the library Pallas flash kernel (no in-kernel PRNG),
silently dropping training onto XLA attention with a materialized
[B,H,L,L] tensor. Before making attn_pdrop=0.0 the shipped default,
this script measures what that costs in QUALITY: train the synthetic
dialogue task to convergence under both settings (every other
regularizer unchanged: resid/embd dropout stay 0.1), several seeds
each, and compare best valid PPL + best valid emotion accuracy.

    JAX_PLATFORMS=cpu python scripts/attn_pdrop_ablation.py

Appends one JSON line per run + a summary line to
results/attn_pdrop_ablation.jsonl. Protocol shared with the other
quality ablations via scripts/ablation_harness.py.
"""

from __future__ import annotations

import os

from ablation_harness import run_quality_ablation

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results", "attn_pdrop_ablation.jsonl")

if __name__ == "__main__":
    run_quality_ablation(
        OUT, "attn_pdrop", (0.1, 0.0),
        model_kw=lambda drop: {"attn_pdrop": drop},
        summary_tag=lambda label: f"drop{label}")
