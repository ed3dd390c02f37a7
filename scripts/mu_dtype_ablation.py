"""Quality ablation: Adam first moments in bfloat16 vs float32.

Context (round 3): ``--adam_mu_dtype=bfloat16`` halves the momentum
buffer and is the HBM headroom that unlocks gpt2-large B=8 (46.4% MFU
vs 37.5% at the fp32-mu-constrained B=4). Before recommending it as
the big-model recipe, this script measures what the precision loss
costs in QUALITY: train the synthetic dialogue task to convergence
under both moment dtypes (same seeds, same everything else) and
compare best valid PPL + emotion accuracy. Mirrors the
attn_pdrop ablation's protocol (scripts/attn_pdrop_ablation.py).

    JAX_PLATFORMS=cpu python scripts/mu_dtype_ablation.py

Appends one JSON line per run + a summary to
results/mu_dtype_ablation.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEEDS = [int(s) for s in os.environ.get("ABLATION_SEEDS", "0,1,2").split(",")]
EPOCHS = int(os.environ.get("ABLATION_EPOCHS", 10))
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results", "mu_dtype_ablation.jsonl")


def run_one(data_dir: str, seed: int, mu_dtype) -> dict:
    from ergm_tpu.core.config import ModelConfig, TrainConfig
    from ergm_tpu.data.assembly import read_meta
    from ergm_tpu.train.trainer import Trainer

    st = read_meta(data_dir)
    mcfg = ModelConfig(
        vocab_size=st.vocab_size, n_positions=128, n_embd=64, n_layer=4,
        n_head=4, use_cross_attention=True, dtype="float32",
        embd_pdrop=0.1, resid_pdrop=0.1, attn_pdrop=0.0)
    with tempfile.TemporaryDirectory() as ckpt:
        cfg = TrainConfig(
            seed=seed, data_dir=data_dir, ckpt_dir=ckpt, output_dir="",
            batch_size=8, num_epochs=EPOCHS, lr=3e-3, max_len=128,
            warmup_ratio=0.1, dtype="float32", mesh_shape=(1,),
            valid_prefix="valid", prng_impl="threefry2x32",
            adam_mu_dtype=mu_dtype)
        tr = Trainer(cfg, model_config=mcfg)
        tr.train()
        _, _, v_acc = tr.validation()
        return {"seed": seed, "mu_dtype": mu_dtype or "float32",
                "best_valid_ppl": tr.best_ppl, "final_valid_emotion_acc": v_acc}


def main():
    from ergm_tpu.data.synthetic import write_synthetic_dataset

    tmp = tempfile.mkdtemp(prefix="mu_dtype_ablation_")
    write_synthetic_dataset(tmp, prefixes=("train", "valid"),
                            num_dialogues=32, turns_per_dialogue=6,
                            base_vocab_size=256, seed=7)
    rows = []
    with open(OUT, "a") as f:
        for mu in (None, "bfloat16"):
            for seed in SEEDS:
                row = run_one(tmp, seed, mu)
                rows.append(row)
                print(json.dumps(row), flush=True)
                f.write(json.dumps(row) + "\n")
                f.flush()
        summary = {}
        for mu in ("float32", "bfloat16"):
            ppls = [r["best_valid_ppl"] for r in rows if r["mu_dtype"] == mu]
            accs = [r["final_valid_emotion_acc"] for r in rows
                    if r["mu_dtype"] == mu]
            summary[f"ppl_mean_{mu}"] = round(float(np.mean(ppls)), 4)
            summary[f"ppl_std_{mu}"] = round(float(np.std(ppls)), 4)
            summary[f"acc_mean_{mu}"] = round(float(np.mean(accs)), 2)
        summary["epochs"] = EPOCHS
        summary["seeds"] = SEEDS
        print(json.dumps({"summary": summary}), flush=True)
        f.write(json.dumps({"summary": summary}) + "\n")


if __name__ == "__main__":
    main()
