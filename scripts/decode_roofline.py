"""Roofline attribution of the B=256 decode step (VERDICT r3 next #1).

The decode headline was flat at ~460 utt/s (0.557 s per B=256
prompt=128/new=128 invocation) for three rounds with no accounting.
This script assembles the round-4 attribution from the measured
ablation rows (scripts/decode_ablation.py, results/decode_ablation
.jsonl) and emits the roofline table against v5e bounds
(197 TFLOP/s bf16 MXU, ~819 GB/s HBM).

Methodology notes (round 4):
- Every ablation "step_ms" = wall / NEW_TOKENS, which AMORTIZES the
  one-time prefill into each step. The NEW=8 row (int8-pfsplit) splits
  them: with total(N) = prefill + N * d_step,
    d_step = (total(128) - total(8)) / 120,  prefill = total(8) - 8 * d.
  Measured: prefill 93 ms (vs ~58 ms compute bound, 62% MFU-ish),
  decode 3.74 ms/step.
- Component costs by variant subtraction share the same prefill, so
  differences are decode-only EXCEPT noattn/nocross, whose prefill
  also shrinks — their derived components are upper bounds.
- Self-attention measured ~1.4 ms vs a 1.47-1.56 ms int8 full-buffer
  read bound: AT the roofline. The levers that moved anything were
  byte-count levers: int8 cross cache (factored scales, -0.11 ms);
  int4 self KV at T>=1024 (7.43 vs 10.39 ms/step, +40% long-context
  decode) but SLOWER at T=256 (5.34: the nibble unpack doesn't fuse
  as well as the dequant multiply).
- Declined with numbers: decode_scan_unroll=12 (4.37 vs 4.18),
  int4 at T=256 (5.34), per-head->merged KV relayout (probe-only win
  that in-model fusion already achieves), full-sequence prefill
  logits removal (XLA had DCE'd it — kept for clarity), B=512
  (2.04x step for 2x batch: no amortization left).

Usage: python scripts/decode_roofline.py [--measure]
  --measure: run the ablation variants at B=256 first (TPU, slow)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ABL = os.path.join(REPO, "results", "decode_ablation.jsonl")
OUT = os.path.join(REPO, "results", "decode_roofline.jsonl")

VARIANTS = ["int8-full", "int8-greedy", "int8-fixed", "int8-noattn",
            "int8-nocross", "int8-nomlp", "int8-noattn6", "int8-fixed6",
            "int8-pfsplit", "int8-combo"]

# analytic bounds for one decode step at the headline config ----------------
B, H, D, L, T, Dm, V, Lc = 256, 12, 64, 12, 256, 768, 50271, 32
BW, MXU = 819e9, 197e12
W_LAYER = (3 + 1 + 1 + 1 + 8) * Dm * Dm      # qkv, proj, cross-q, cross-proj, mlp
W_TRUNK = W_LAYER * L + 2 * Dm * 1024        # + wpe (wte counted in lm_head)
W_LMHEAD = V * Dm
KV_BYTES = 2 * L * B * H * T * D             # int8 K+V, full buffer per step
KV_SCALE = 2 * L * B * H * T * 4             # f32 per-(token, head) scales
CROSS_BYTES = 2 * L * B * Lc * Dm * 2        # bf16 merged-head ck/cv
CROSS_BYTES_I8 = 2 * L * B * Lc * (Dm + 4 * H)
BOUNDS = {
    "sampler": 2 * B * V * 4 / BW,           # read f32 logits twice (top-k+lse)
    "lm_head": max(W_LMHEAD * 2 / BW, 2 * W_LMHEAD * B / MXU) + B * V * 4 / BW,
    "self_attention": (KV_BYTES + KV_SCALE) / BW,
    "cross_attention": CROSS_BYTES / BW,
    "cross_attention_int8": CROSS_BYTES_I8 / BW,
    "matmul_trunk": max(W_TRUNK * 2 / BW, 2 * W_TRUNK * B / MXU),
}
PREFILL_FLOPS = 2 * (W_TRUNK + W_LMHEAD / 128) * B * 128  # lm_head: last pos


def measure():
    env = dict(os.environ, AB_BATCH="256", AB_CHAIN="2", AB_REPS="2")
    subprocess.run([sys.executable,
                    os.path.join(REPO, "scripts", "decode_ablation.py"),
                    *[v for v in VARIANTS if v != "int8-pfsplit"]],
                   env=env, check=True)
    env.update(AB_NEW="8", AB_CHAIN="4")
    subprocess.run([sys.executable,
                    os.path.join(REPO, "scripts", "decode_ablation.py"),
                    "int8-pfsplit"], env=env, check=True)


def latest_rows():
    rows = {}
    with open(ABL) as f:
        for line in f:
            d = json.loads(line)
            if d.get("variant") in VARIANTS and d.get("B") == 256 \
                    and d.get("weight") in ("auto", None):
                rows[d["variant"]] = d  # latest wins
    missing = [v for v in VARIANTS if v not in rows]
    if missing:
        raise SystemExit(f"no B=256 rows for {missing}; run with --measure")
    return rows


def main():
    if "--measure" in sys.argv:
        measure()
    rows = latest_rows()
    ms = {v: rows[v]["step_ms"] for v in VARIANTS}
    total128 = rows["int8-full"]["best_s"]
    total8 = rows["int8-pfsplit"]["best_s"]
    d_step = (total128 - total8) / 120.0 * 1e3          # ms, decode only
    prefill_ms = (total8 - 8 * d_step * 1e-3) * 1e3
    comp = {
        "sampler": ms["int8-full"] - ms["int8-greedy"],
        "lm_head": ms["int8-greedy"] - ms["int8-fixed"],
        "self+cross_attention": ms["int8-fixed"] - ms["int8-noattn"],
        "cross_attention_total": ms["int8-full"] - ms["int8-nocross"],
        "mlp": ms["int8-full"] - ms["int8-nomlp"],
        "trunk_and_overhead": ms["int8-noattn"],
    }
    per_layer_trunk = (ms["int8-noattn"] - ms["int8-noattn6"]) / 6.0
    fixed_trunk = ms["int8-noattn"] - 12 * per_layer_trunk
    table = []
    bound_key = {"sampler": "sampler", "lm_head": "lm_head",
                 "self+cross_attention": None, "cross_attention_total":
                 "cross_attention", "mlp": None,
                 "trunk_and_overhead": "matmul_trunk"}
    for name, t in comp.items():
        bk = bound_key[name]
        bound = BOUNDS.get(bk) if bk else None
        table.append({
            "component": name, "measured_ms": round(t, 3),
            "bound_ms": round(bound * 1e3, 3) if bound else None,
            "x_above_bound": round(t / (bound * 1e3), 2) if bound else None,
        })
    ideal_decode = (BOUNDS["sampler"] + BOUNDS["lm_head"]
                    + BOUNDS["self_attention"]
                    + BOUNDS["cross_attention_int8"]
                    + BOUNDS["matmul_trunk"]) * 1e3
    prefill_bound_ms = PREFILL_FLOPS / MXU * 1e3
    total_bound_s = (prefill_bound_ms + 128 * ideal_decode) / 1e3
    combo = rows["int8-combo"]["best_s"]
    row = {"round": 4, "study": "decode_roofline", "B": B, "T": T,
           "config": "headline: gpt2, int8 kv, int8 cross, bf16 w, "
                     "prompt=128, new=128",
           "invocation_s": {"int8_cross_bf16": total128,
                            "int8_cross_int8": combo},
           "prefill_ms": round(prefill_ms, 1),
           "prefill_bound_ms": round(prefill_bound_ms, 1),
           "decode_step_ms": round(d_step, 3),
           "decode_step_bound_ms": round(ideal_decode, 2),
           "amortized_prefill_ms_per_step": round(prefill_ms / 128, 3),
           "components_incl_amortized_prefill": table,
           "per_layer_trunk_ms": round(per_layer_trunk, 4),
           "fixed_trunk_ms": round(fixed_trunk, 3),
           "total_bound_s": round(total_bound_s, 3),
           "headroom_x": round(combo / total_bound_s, 2),
           "bounds_basis": "v5e 197 TFLOP/s bf16, 819 GB/s HBM; "
                           "int8 KV full-buffer read per step"}
    print(json.dumps(row, indent=1))
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
