"""Checkpoint conversion CLI: torch/HF <-> ERGM-TPU orbax params.

Bridges reference-trained checkpoints (torch .ckpt blobs,
src/main.py:186-196) and local HF GPT-2 pretrained dirs into this
framework, and exports back to an HF-style torch state dict for
ecosystem interop.

    # torch/HF -> orbax params (start training/inference from it via
    # --init_params)
    python -m ergm_tpu.cli.convert_ckpt --src path/to/ckpt_or_hf_dir \
        --dst converted_params --model_type gpt2 --vocab_size 50270

    # ERGM-TPU orbax checkpoint -> torch state dict
    python -m ergm_tpu.cli.convert_ckpt --reverse \
        --src saved_models/gpt2/best_ckpt_... --dst exported.pt \
        --model_type gpt2 --vocab_size 50270
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser(description="Convert checkpoints to/from ERGM-TPU")
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--model_type", default="gpt2")
    p.add_argument("--vocab_size", type=int, default=None,
                   help="Target vocab (with special tokens); defaults to the "
                        "checkpoint's own vocab.")
    p.add_argument("--reverse", action="store_true",
                   help="Export ERGM-TPU orbax params to a torch state dict.")
    p.add_argument("--no_cross_attention", action="store_true")
    p.add_argument("--n_head", type=int, default=None,
                   help="Head count (defaults to the model_type's); geometry "
                        "otherwise inferred from the checkpoint.")
    args = p.parse_args(argv)

    import jax
    import orbax.checkpoint as ocp

    from ergm_tpu.core.config import ModelConfig

    if args.reverse:
        import torch

        from ergm_tpu.models import gpt2
        from ergm_tpu.models.convert import params_to_hf
        from ergm_tpu.train.checkpoint import restore_params

        with ocp.PyTreeCheckpointer() as ckptr:
            raw = ckptr.restore(os.path.abspath(args.src))
        params = raw["params"] if "params" in raw else raw
        n_layer, n_embd = params["blocks"]["ln_1"]["scale"].shape
        overrides = dict(
            vocab_size=args.vocab_size or params["wte"]["embedding"].shape[0],
            n_layer=int(n_layer), n_embd=int(n_embd),
            n_positions=int(params["wpe"]["embedding"].shape[0]),
            use_cross_attention="cross_attn" in params["blocks"])
        if args.n_head:
            overrides["n_head"] = args.n_head
        cfg = ModelConfig.from_model_type(args.model_type, **overrides)
        sd = params_to_hf(params, cfg)
        torch.save({k: torch.tensor(v) for k, v in sd.items()}, args.dst)
        print(f"wrote torch state dict ({len(sd)} tensors) to {args.dst}")
        return

    from ergm_tpu.models.convert import hf_to_params, infer_geometry
    from ergm_tpu.utils.torch_io import load_torch_state

    state = load_torch_state(args.src)
    geom = infer_geometry(state)
    src_vocab = geom.pop("vocab_size")
    vocab = args.vocab_size or src_vocab
    overrides = dict(geom, vocab_size=vocab,
                     use_cross_attention=not args.no_cross_attention)
    if args.n_head:
        overrides["n_head"] = args.n_head
    cfg = ModelConfig.from_model_type(args.model_type, **overrides)
    params = hf_to_params(state, cfg, rng=jax.random.PRNGKey(0))
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(args.dst), {"params": params}, force=True)
    print(f"converted {args.src} (vocab {src_vocab} -> {vocab}) to {args.dst}")


if __name__ == "__main__":
    main()
