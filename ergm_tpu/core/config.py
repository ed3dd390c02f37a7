"""Configuration dataclasses for ERGM-TPU.

``ModelConfig`` covers the GPT-2 family the reference supports
(reference: src/model.py:40-46 lists gpt2, gpt2-medium, gpt2-large,
gpt2-xl, distilgpt2) plus the ERGM extensions (emotion head, caption
cross-attention, modality injection; reference: src/model.py:275,
495-498, 607-608).

``TrainConfig`` mirrors the reference argparse surface
(reference: src/main.py:339-361) so ``train.sh`` / ``infer.sh`` keep
their flag names, and adds TPU-native knobs (mesh shape, dtype policy,
remat) that have no reference counterpart.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp

# GPT-2 family hyperparameters, keyed by the reference model_type strings
# (reference: src/model.py:40-46).
GPT2_SIZES = {
    "distilgpt2": dict(n_layer=6, n_head=12, n_embd=768),
    "gpt2": dict(n_layer=12, n_head=12, n_embd=768),
    "gpt2-medium": dict(n_layer=24, n_head=16, n_embd=1024),
    "gpt2-large": dict(n_layer=36, n_head=20, n_embd=1280),
    "gpt2-xl": dict(n_layer=48, n_head=25, n_embd=1600),
}

GPT2_VOCAB_SIZE = 50257


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture config for the ERGM GPT-2 backbone.

    Defaults match HF GPT2Config (the reference vendors HF GPT-2;
    src/model.py:33), with the ERGM additions:

    - ``num_emotions``: 7-way emotion classification head on the final
      hidden state (reference: src/model.py:607-608).
    - ``use_cross_attention``: per-block cross-attention over caption
      token embeddings shared through ``wte`` (reference:
      src/model.py:275, 280-282, 460-463). Unlike the reference — which
      force-enables it and then crashes when captions are absent
      (src/model.py:521, a latent NameError; SURVEY.md §2.4.2) — the
      rebuild allocates the weights when this flag is set but skips the
      sublayer whenever no encoder states are given.
    - ``modality_dim``: incoming audio/visual feature dimension
      (wav2vec2-base / BLIP-base emit 768;
      data_process/feature_extraction.py:8-52). When it differs from
      ``n_embd`` a learned projection is applied (fixes SURVEY.md
      §2.4.12's shape fragility).
    """

    vocab_size: int = GPT2_VOCAB_SIZE
    n_positions: int = 1024
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    n_inner: Optional[int] = None  # defaults to 4*n_embd
    activation: str = "gelu_new"
    layer_norm_epsilon: float = 1e-5
    initializer_range: float = 0.02
    embd_pdrop: float = 0.1
    # Attention-prob dropout (reference: src/model.py:101, 142; HF
    # default 0.1). Served IN-KERNEL by the fused block-attention Pallas
    # kernel (ergm_tpu/ops/block_attention.py) at ~4% attention cost —
    # round 2 shipped 0.0 because dropout used to force the XLA fallback
    # with a materialized [B,H,L,L] tensor; with the in-kernel PRNG the
    # reference-parity default is restored. (Quality had also been
    # ablated as neutral on the synthetic task across 6 seeds:
    # results/attn_pdrop_ablation.jsonl.)
    attn_pdrop: float = 0.1
    resid_pdrop: float = 0.1
    # Attention-scaling options preserved for logit parity
    # (reference: src/model.py:87, 90, 92, 122-128).
    scale_attn_weights: bool = True
    scale_attn_by_inverse_layer_idx: bool = False
    # Accepted for config parity (src/model.py:92): the rebuild ALWAYS
    # computes the softmax in fp32, i.e. behaves as if this were True;
    # the flag is recorded but changes nothing.
    reorder_and_upcast_attn: bool = False
    # ERGM extensions
    num_emotions: int = 7
    use_cross_attention: bool = True
    modality_dim: int = 768
    # Numerics policy (TPU-native; no reference counterpart).
    # "bfloat16" activations with fp32 softmax/loss, or "float32" for
    # the parity mode used by the golden tests (SURVEY.md §7.4).
    dtype: str = "float32"
    remat: bool = False  # jax.checkpoint per block (ref: model.py:377-379)
    # Rematerialization policy when remat=True:
    #   "full"  — recompute the whole block in backward (smallest memory,
    #             most recompute; round-1 default, ~26% MFU),
    #   "dots"  — jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims:
    #             saves matmul outputs, recomputes elementwise/softmax only
    #             (measured slower than "full" at B=64: the saves spill),
    #   "mlp"   — checkpoint only the MLP/cross-attn sublayers; attention
    #             keeps its VJP residuals so backward never re-runs the
    #             flash forward (measured best: 79.7k tok/s / 38.0% MFU
    #             at B=48 L=512 on v5e vs 76.2k for "full" at B=64; the
    #             default). Costs memory — gpt2 B=64 x L=512 OOMs v5e
    #             HBM by ~200 MB; use "full" for larger batches,
    #   "mlp_only" — like "mlp" but cross-attention also keeps its
    #             residuals (no recompute at all; the most memory).
    remat_policy: str = "mlp"
    # sequence-chunk size for the rematerialized LM loss (models/gpt2.py
    # chunked_lm_loss): bounds live logits memory at O(B * chunk * V)
    loss_chunk: int = 128
    # training LM-loss backend when logits aren't needed:
    #   "auto"    — fused Pallas softmax-xent kernel on TPU (never
    #               materializes [tokens, V] logits; ops/fused_ce.py),
    #               chunked elsewhere,
    #   "chunked" — always the jax.checkpoint'd chunked path,
    #   "fused"   — always the Pallas kernel (interpret mode off-TPU).
    lm_loss_impl: str = "auto"
    # Attention backend: "auto" picks the Pallas flash kernel on TPU and
    # the XLA reference path elsewhere; "xla" / "pallas" force a path.
    attention_impl: str = "auto"
    # Unroll factor for the decode-step layer scan (1 = no unroll). The
    # single-token step is latency-bound on many tiny matmuls; unrolling
    # lets XLA overlap weight prefetch across layers. Prefill/training
    # keep the rolled scan (compile size).
    decode_scan_unroll: int = 1
    # Fuse each decode step's LN2+MLP+residual tail into one Pallas
    # program (ops/fused_decode.py): the device trace shows the step's
    # trunk is a diffuse floor of 20-70us XLA fusions, and the MLP tail
    # is the largest fusable run. bf16 weights only (int8 weights keep
    # XLA's dequant-fused matmul read); falls back automatically when
    # the shape/dtype gate fails. Default off pending TPU validation in
    # each deployment (results match the unfused path to bf16 rounding,
    # not bitwise — MXU accumulation order differs).
    decode_fused_mlp: bool = False
    # "auto" stores decode K/V in the compute dtype; "int8" quantizes the
    # self-attention cache with per-(token, head) scales, halving the
    # cache-read bandwidth that dominates long decode; "int4" halves it
    # again (jnp.int4 is a native packed TPU dtype) — a serving option
    # whose quality cost is quantified separately (larger per-value
    # error at 4-bit mantissas; see tests/test_int8_kv.py int4 cases).
    kv_cache_dtype: str = "auto"
    # Cross-attention (caption) cache storage: "auto" keeps the compute
    # dtype; "int8" stores the merged-head ck/cv int8 with
    # per-(token, head) scales FACTORED out of the lane-grouped decode
    # reductions (round-3 declined dequantize-then-attend; the factored
    # form measured 0.32 vs 0.51 ms/step bf16 at B=256 —
    # results/int4_kv_probe.jsonl).
    cross_kv_dtype: str = "auto"
    # Serving weight storage: "auto" keeps the compute dtype; "int8"
    # stores dense kernels as int8 + per-out-channel scales
    # (models/gpt2.py quantize_params_int8). Measured +7% at B=1 decode
    # (the step is per-op-latency bound, so halved weight bytes don't
    # pay 2x); quality on a trained model: PPL +0.09%, greedy
    # agreement 1.0. "int8_lm_head" quantizes ONLY the tied wte read —
    # the biggest single per-step weight (77 MB bf16 at 50k vocab) —
    # leaving the trunk bf16 (full int8 measured a wash at large batch).
    # Training always uses full-precision weights.
    weight_dtype: str = "auto"

    # set by models.gpt2.prune_heads: after pruning, attention width is
    # n_head * head_dim != n_embd, so the derived value no longer applies
    head_dim_override: Optional[int] = None

    @property
    def head_dim(self) -> int:
        if self.head_dim_override is not None:
            return self.head_dim_override
        assert self.n_embd % self.n_head == 0
        return self.n_embd // self.n_head

    @property
    def inner_dim(self) -> int:
        return self.n_inner if self.n_inner is not None else 4 * self.n_embd

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32

    @classmethod
    def from_model_type(cls, model_type: str, **overrides) -> "ModelConfig":
        """Build a config from a reference model_type string (e.g. 'gpt2-medium')."""
        if model_type not in GPT2_SIZES:
            raise ValueError(
                f"Unknown model_type {model_type!r}; expected one of {sorted(GPT2_SIZES)}"
            )
        return cls(**{**GPT2_SIZES[model_type], **overrides})

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass
class TrainConfig:
    """Runtime config mirroring the reference CLI (src/main.py:339-361).

    Field names intentionally match the argparse flags so that
    ``train.sh`` / ``infer.sh`` translate one-to-one.
    """

    seed: int = 0
    mode: str = "train"  # train | infer (src/main.py:341)
    data_dir: str = "data"
    train_prefix: str = "train"
    valid_prefix: str = "valid"
    model_type: str = "gpt2"
    bos_token: str = "<bos>"
    sp1_token: str = "<sp1>"
    sp2_token: str = "<sp2>"
    lr: float = 2e-5
    warmup_ratio: float = 0.1
    batch_size: int = 16
    num_workers: int = 0
    num_epochs: int = 100
    max_len: int = 1024
    max_turns: int = 10  # history truncation, actually honored here
    # (the reference parses but never uses it; SURVEY.md §2.4.8)
    top_p: float = 0.95
    ckpt_dir: str = "saved_models"
    output_dir: str = "outputs"
    ckpt_name: Optional[str] = None
    # TPU-native additions (no reference counterpart)
    mesh_shape: Tuple[int, ...] = (-1,)  # data-parallel over all devices
    mesh_axis_names: Tuple[str, ...] = ("data",)
    dtype: str = "bfloat16"
    # remat on by default: measured faster end-to-end on v5e because it
    # unlocks batch sizes the non-remat program cannot compile at
    # (46.5k tok/s at B=64-128 vs 39.8k at B=8), cf. jax.checkpoint
    remat: bool = True
    tokenizer_dir: Optional[str] = None  # dir with vocab.json/merges.txt
    init_params: Optional[str] = None  # orbax params dir (e.g. converted HF/torch)
    keep_best: Optional[int] = None  # retain only the N lowest-PPL checkpoints
    log_every: int = 50
    # PRNG impl for the training-step keys (dropout): "rbg" uses the TPU
    # hardware generator — measured +2.8% train throughput over threefry
    # (81.9k vs 79.7k tok/s at gpt2 B=48 L=512 on v5e). Param init stays
    # threefry (seed-portable); set "threefry2x32" for a fully portable
    # dropout stream too.
    prng_impl: str = "rbg"
    # Dropout overrides (None = ModelConfig defaults; attention-prob
    # dropout runs in-kernel on the fused block-attention path — see
    # PARITY.md "attention dropout").
    attn_pdrop: Optional[float] = None
    resid_pdrop: Optional[float] = None
    embd_pdrop: Optional[float] = None
    # Adam first-moment storage dtype (optax mu_dtype). "bfloat16"
    # halves the momentum buffer (~2 bytes/param) — the HBM headroom
    # that unlocks gpt2-large B=8-12 (48.1% MFU vs 37.5% at the
    # fp32-mu-constrained B=4) and gpt2-medium under remat_policy=mlp.
    # Quality-neutral on the synthetic-task ablation
    # (results/mu_dtype_ablation.jsonl). Second moments stay fp32
    # (Adam's nu sets per-param scale; mu is robust). None = fp32.
    adam_mu_dtype: Optional[str] = None
    # Rematerialization policy override (None = ModelConfig default
    # "mlp"). Measured single-chip recipes (scripts/train_bench.py):
    # gpt2 B=48 mlp; gpt2-medium B=12 mlp + bf16 mu; gpt2-large B=12
    # full + bf16 mu.
    remat_policy: Optional[str] = None
    # Gradient accumulation (optax.MultiSteps): average grads over k
    # micro-batches before each optimizer update — effective batch
    # k*batch_size past the single-chip HBM frontier (B=48 on v5e for
    # gpt2). The LR schedule counts OPTIMIZER steps, so warmup/decay
    # match an equivalent large-batch run. 1 = off.
    grad_accum_steps: int = 1
    # ZeRO-1 (optimizer-state sharding over the mesh data axis): AdamW
    # keeps fp32 moments per param, so pure DP replicates ~8 bytes/param
    # of optimizer state per chip — the binding constraint for gpt2-xl
    # (~15.5 GB of Adam state vs 15.75 GB v5e HBM). With this on, the
    # moments shard over 'data' (core/mesh.zero1_sharding_tree) and the
    # elementwise Adam update runs per shard. No effect on a 1-device
    # data axis. Off by default: single-chip is the common case and the
    # sharded update adds collectives the 1-chip path never needs.
    shard_opt_state: bool = False
    # Preemption-safe training (TPU spot/preemptible VMs send SIGTERM):
    # on the first SIGTERM the Trainer finishes the in-flight step block,
    # saves an emergency checkpoint (ckpt_dir/preempt_ckpt — resume with
    # --ckpt_name=preempt), and returns; a second SIGTERM restores the
    # default handler (immediate exit). Cleared on clean completion.
    save_on_preempt: bool = True
    # Length-grouped batching (K > 1 = on): sort examples by length
    # within megabatches of K*batch_size after the epoch shuffle, then
    # shuffle batch order — similar-length rows share a bucket, cutting
    # the pad compute a uniform shuffle burns (real/padded token ratio
    # 0.358 -> 0.67 on a MELD-like length mix; see data/dataset.batches).
    # Applies to the plain loader; no-op under multi-host static shapes.
    length_grouped: int = 0
    # Bucket quantum for batch lengths (batches pad to multiples of
    # this, capped at max_len). 128 keeps <=8 compiled shapes; with
    # length_grouped on, 64 recovers another ~13% real/padded at <=16
    # shapes (each shape compiles once, ~20-40 s cold on TPU).
    pad_multiple: int = 128

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)
