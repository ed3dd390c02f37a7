"""Quality ablation: Adam first moments in bfloat16 vs float32.

Context (round 3): ``--adam_mu_dtype=bfloat16`` halves the momentum
buffer and is the HBM headroom that unlocks gpt2-large B=8 (46.4% MFU
vs 37.5% at the fp32-mu-constrained B=4). Before recommending it as
the big-model recipe, this script measures what the precision loss
costs in QUALITY: train the synthetic dialogue task to convergence
under both moment dtypes (same seeds, same everything else) and
compare best valid PPL + emotion accuracy.

    JAX_PLATFORMS=cpu python scripts/mu_dtype_ablation.py

Appends one JSON line per run + a summary to
results/mu_dtype_ablation.jsonl. Protocol shared with the other
quality ablations via scripts/ablation_harness.py.
"""

from __future__ import annotations

import os

from ablation_harness import run_quality_ablation

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results", "mu_dtype_ablation.jsonl")

if __name__ == "__main__":
    run_quality_ablation(
        OUT, "mu_dtype", (None, "bfloat16"),
        train_kw=lambda mu: {"adam_mu_dtype": mu},
        arm_label=lambda mu: mu or "float32")
