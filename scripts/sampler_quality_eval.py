"""Quality delta of the `approx` nucleus sampler vs `full_sort` (VERDICT
r2 #8).

The default sampler uses lax.approx_max_k over the top-64 logits
(recall >= 0.95 per true top-k member); the reference's math is a
full-vocab sort (src/main.py:259-270, our `full_sort` mode). Whenever
the nucleus fits inside the (approximate) top-64 the kept set is
identical, but published quality metrics should not rest on that claim
alone — this script MEASURES the delta on a trained model:

1. trains the synthetic dialogue task to convergence (or loads
   --init_params),
2. per-step sampled-token TV distance between the two samplers on the
   same logits (the distribution-level check, teacher-forced over
   validation batches),
3. full run_test generations under each sampler -> dist-1/2, BLEU, and
   BERTScore over a shared embed oracle (hash-free: the trained wte),
   plus test PPL (sampler-independent, as a control).

    JAX_PLATFORMS=cpu python scripts/sampler_quality_eval.py    # CPU ok

Appends JSON lines to results/sampler_quality.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results", "sampler_quality.jsonl")
TOP_P = float(os.environ.get("SQ_TOP_P", 0.8))
EPOCHS = int(os.environ.get("SQ_EPOCHS", 8))
SEEDS = int(os.environ.get("SQ_SEEDS", 200))


def emit(row):
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def main():
    import jax
    import jax.numpy as jnp

    from ergm_tpu.core.config import ModelConfig, TrainConfig
    from ergm_tpu.data.assembly import read_meta
    from ergm_tpu.data.dataset import DialogueDataset
    from ergm_tpu.data.synthetic import write_synthetic_dataset
    from ergm_tpu.evaluation.evaluate import Evaluator
    from ergm_tpu.infer.generate import sample_top_p, top_p_filter
    from ergm_tpu.infer.runner import run_test
    from ergm_tpu.models import gpt2
    from ergm_tpu.train.trainer import Trainer

    tmp = tempfile.mkdtemp(prefix="sampler_quality_")
    write_synthetic_dataset(tmp, prefixes=("train", "valid"),
                            num_dialogues=32, turns_per_dialogue=6,
                            base_vocab_size=256, seed=13)
    st = read_meta(tmp)
    small = os.environ.get("SQ_MODEL", "small") == "small"
    mcfg = ModelConfig(
        vocab_size=st.vocab_size, n_positions=128,
        n_embd=64 if small else 768, n_layer=4 if small else 12,
        n_head=4 if small else 12, use_cross_attention=True,
        dtype="float32" if small else "bfloat16")
    tcfg = TrainConfig(seed=0, data_dir=tmp, ckpt_dir=os.path.join(tmp, "ck"),
                       output_dir="", batch_size=8, num_epochs=EPOCHS,
                       lr=3e-3 if small else 3e-4, max_len=128,
                       dtype=mcfg.dtype, mesh_shape=(1,),
                       valid_prefix="valid", prng_impl="threefry2x32")
    tr = Trainer(tcfg, model_config=mcfg)
    tr.train()
    params = tr.state.params

    # --- (2) sampled-token TV distance on identical trained logits
    ds = DialogueDataset("valid", tmp, sp1_id=st.sp1_id, sp2_id=st.sp2_id,
                         eos_id=st.eos_id, max_len=128)
    ex = ds[0]
    ids = jnp.asarray(np.asarray(ex.input_ids)[None], jnp.int32)
    logits = gpt2.forward(params, mcfg, ids).logits[:, -1, :]  # [1, V]

    def empirical(sampler_fn):
        counts = np.zeros(mcfg.vocab_size)
        for s in range(SEEDS):
            t = int(np.asarray(sampler_fn(jax.random.PRNGKey(s)))[0])
            counts[t] += 1
        return counts / SEEDS

    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    filtered = top_p_filter(probs, TOP_P)

    def full_sort_sample(key):
        return jax.random.categorical(
            key, jnp.log(jnp.maximum(filtered, 1e-20)), axis=-1)

    emp_full = empirical(full_sort_sample)
    emp_approx = empirical(lambda k: sample_top_p(logits, k, TOP_P,
                                                  top_k=64, approx=True))
    emp_exact = empirical(lambda k: sample_top_p(logits, k, TOP_P,
                                                 top_k=64, approx=False))
    # analytic exact distributions where computable
    exact_dist = np.asarray(filtered[0])
    tv_mc = 0.5 * np.abs(emp_full - emp_approx).sum()
    emit({"check": "sampled_token_tv", "top_p": TOP_P, "n": SEEDS,
          "tv_full_vs_approx_mc": round(float(tv_mc), 4),
          "tv_full_vs_exact_mc": round(float(0.5 * np.abs(emp_full - emp_exact).sum()), 4),
          "mc_noise_floor": round(float(0.5 * np.abs(
              emp_full - exact_dist).sum()), 4),
          "nucleus_size": int((exact_dist > 0).sum())})

    # --- (3) end-to-end metric deltas per sampler
    embed_table = np.asarray(params["wte"]["embedding"], np.float32)

    def embed_fn(texts):
        outs = []
        for t in texts:
            tok_ids = [int(x) % mcfg.vocab_size for x in t.split() if x.isdigit()] or [0]
            outs.append(embed_table[tok_ids])
        return outs

    ds = DialogueDataset("valid", tmp, sp1_id=st.sp1_id, sp2_id=st.sp2_id,
                         eos_id=st.eos_id, max_len=128,
                         limit=int(os.environ.get("SQ_EVAL_DIALOGUES", 8)))
    for sampler in ("approx", "exact", "full_sort"):
        res = run_test(params, mcfg, ds, batch_size=8, eos_id=st.eos_id,
                       sp2_id=st.sp2_id, max_len=128, top_p=TOP_P, seed=0,
                       sampler=sampler)
        ev = Evaluator(embed_fn=embed_fn)
        m = ev.evaluate_all(res.hypotheses, res.references,
                            true_label_ids=res.true_labels, losses=res.losses,
                            pred_label_ids=res.pred_labels,
                            loss_token_counts=res.loss_tokens)
        emit({"check": "end_to_end", "sampler": sampler, "top_p": TOP_P,
              **{k: round(float(v), 4) for k, v in m.items()
                 if k in ("dist_1", "dist_2", "bleu", "bs_f1", "ppl",
                          "ppl_token_weighted", "emotion_acc")}})


if __name__ == "__main__":
    main()
