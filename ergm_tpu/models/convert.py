"""Weight conversion between HF/torch GPT-2 checkpoints and ERGM-TPU params.

The reference fine-tunes from HF ``GPT2LMHeadModel.from_pretrained``
(src/main.py:62) and saves torch state dicts (src/main.py:186-196). This
module maps those state dicts onto the ERGM-TPU param pytree
(ergm_tpu/models/gpt2.py docstring for the layout), handling:

- Conv1D orientation: HF GPT-2 Conv1D stores weights (in, out) — the
  same orientation as our kernels — so attention/MLP weights copy
  straight through, while nn.Linear heads (emotion head; src/model.py:608)
  store (out, in) and must be transposed (SURVEY.md §5 checkpoint row).
- lm_head tying: HF ties lm_head.weight to wte (src/model.py:600);
  our params never store a separate lm_head, so it is skipped.
- per-layer stacking: h.{i}.* tensors stack into [n_layer, ...] arrays
  for the lax.scan layer stack.
- vocab resize: a converted wte may be smaller than config.vocab_size
  (special tokens added after pretraining); extra rows are appended with
  N(0, initializer_range) like HF resize_token_embeddings.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import jax
import numpy as np

from ergm_tpu.core.config import ModelConfig


def _to_np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor without importing torch at module scope. COPY, don't
    # view: .numpy() shares the tensor's storage, and JAX's CPU backend
    # zero-copies aligned numpy arrays into device buffers — the
    # converted params would silently alias the live torch model, so a
    # later optimizer step / load_state_dict / resize on the torch side
    # would mutate them in place (caught by the training-dynamics parity
    # test, whose torch loop trained "our" params through the alias).
    return np.array(t.detach().cpu().numpy())


def _strip_prefix(state: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in state.items():
        if k.startswith("transformer."):
            k = k[len("transformer."):]
        out[k] = _to_np(v)
    return out


def infer_geometry(state_dict: Mapping[str, Any]) -> Dict[str, int]:
    """(n_layer, n_embd, n_positions, vocab_size) from a GPT-2 state dict.
    n_head is not recoverable from weights and must come from config."""
    sd = _strip_prefix(state_dict)
    n_layer = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("h."))
    vocab, n_embd = sd["wte.weight"].shape
    n_positions = sd["wpe.weight"].shape[0]
    return {"n_layer": n_layer, "n_embd": n_embd,
            "n_positions": n_positions, "vocab_size": vocab}


def hf_to_params(
    state_dict: Mapping[str, Any],
    config: ModelConfig,
    rng: Optional[jax.Array] = None,
) -> Dict[str, Any]:
    """Convert an HF GPT-2 (or reference-checkpoint) state dict to params.

    Accepts GPT2Model, GPT2LMHeadModel, or the reference's extended model
    (with crossattention.* and emotion_head.*) state dicts.
    """
    import jax.numpy as jnp

    sd = _strip_prefix(state_dict)
    L = config.n_layer

    def get(name):
        if name not in sd:
            raise KeyError(f"missing tensor {name!r} in checkpoint")
        return sd[name]

    def stack(fmt):
        return jnp.asarray(np.stack([get(fmt.format(i)) for i in range(L)]))

    def ln(fmt):
        return {"scale": stack(fmt + ".weight"), "bias": stack(fmt + ".bias")}

    def conv(fmt):
        return {"kernel": stack(fmt + ".weight"), "bias": stack(fmt + ".bias")}

    params: Dict[str, Any] = {
        "wte": {"embedding": jnp.asarray(get("wte.weight"))},
        "wpe": {"embedding": jnp.asarray(get("wpe.weight"))},
        "blocks": {
            "ln_1": ln("h.{}.ln_1"),
            "attn": {"c_attn": conv("h.{}.attn.c_attn"),
                     "c_proj": conv("h.{}.attn.c_proj")},
            "ln_2": ln("h.{}.ln_2"),
            "mlp": {"c_fc": conv("h.{}.mlp.c_fc"),
                    "c_proj": conv("h.{}.mlp.c_proj")},
        },
        "ln_f": {"scale": jnp.asarray(get("ln_f.weight")),
                 "bias": jnp.asarray(get("ln_f.bias"))},
    }

    has_cross = "h.0.crossattention.q_attn.weight" in sd
    if config.use_cross_attention:
        if has_cross:
            params["blocks"]["ln_cross"] = ln("h.{}.ln_cross_attn")
            params["blocks"]["cross_attn"] = {
                "q_attn": conv("h.{}.crossattention.q_attn"),
                "c_attn": conv("h.{}.crossattention.c_attn"),
                "c_proj": conv("h.{}.crossattention.c_proj"),
            }
        else:
            # Pretrained vanilla GPT-2: fresh cross-attn like the reference's
            # strict=False load (src/main.py:103).
            if rng is None:
                rng = jax.random.PRNGKey(0)
            from ergm_tpu.models.gpt2 import init_params

            fresh = init_params(rng, config)
            params["blocks"]["ln_cross"] = fresh["blocks"]["ln_cross"]
            params["blocks"]["cross_attn"] = fresh["blocks"]["cross_attn"]

    # nn.Linear heads store (out, in): transpose.
    if "emotion_head.weight" in sd:
        params["emotion_head"] = {"kernel": jnp.asarray(sd["emotion_head.weight"].T)}
    else:
        if rng is None:
            rng = jax.random.PRNGKey(0)
        from ergm_tpu.models.gpt2 import init_params

        params["emotion_head"] = init_params(jax.random.fold_in(rng, 7), config)["emotion_head"]

    for tname, pname in (("img_proj", "img_proj"), ("aud_proj", "aud_proj")):
        if f"{tname}.weight" in sd:
            params[pname] = {"kernel": jnp.asarray(sd[f"{tname}.weight"].T),
                             "bias": jnp.asarray(sd[f"{tname}.bias"])}

    # vocab resize for registered special tokens
    cur_vocab = params["wte"]["embedding"].shape[0]
    if cur_vocab < config.vocab_size:
        from ergm_tpu.models.gpt2 import resize_token_embeddings

        if rng is None:
            rng = jax.random.PRNGKey(0)
        params = resize_token_embeddings(params, jax.random.fold_in(rng, 11),
                                         config.vocab_size, config)
    elif cur_vocab > config.vocab_size:
        raise ValueError(
            f"checkpoint vocab {cur_vocab} > config vocab {config.vocab_size}")
    return params


def params_to_hf(params: Dict[str, Any], config: ModelConfig) -> Dict[str, np.ndarray]:
    """Export params back to an HF-style state dict (numpy), for ecosystem
    interop and round-trip tests. lm_head.weight is emitted tied to wte."""
    out: Dict[str, np.ndarray] = {}
    p = jax.tree_util.tree_map(np.asarray, params)
    out["transformer.wte.weight"] = p["wte"]["embedding"]
    out["transformer.wpe.weight"] = p["wpe"]["embedding"]
    b = p["blocks"]
    for i in range(config.n_layer):
        pre = f"transformer.h.{i}"
        out[f"{pre}.ln_1.weight"] = b["ln_1"]["scale"][i]
        out[f"{pre}.ln_1.bias"] = b["ln_1"]["bias"][i]
        for mod, ours in (("attn.c_attn", b["attn"]["c_attn"]),
                          ("attn.c_proj", b["attn"]["c_proj"]),
                          ("mlp.c_fc", b["mlp"]["c_fc"]),
                          ("mlp.c_proj", b["mlp"]["c_proj"])):
            out[f"{pre}.{mod}.weight"] = ours["kernel"][i]
            out[f"{pre}.{mod}.bias"] = ours["bias"][i]
        if "cross_attn" in b:
            out[f"{pre}.ln_cross_attn.weight"] = b["ln_cross"]["scale"][i]
            out[f"{pre}.ln_cross_attn.bias"] = b["ln_cross"]["bias"][i]
            for mod in ("q_attn", "c_attn", "c_proj"):
                out[f"{pre}.crossattention.{mod}.weight"] = b["cross_attn"][mod]["kernel"][i]
                out[f"{pre}.crossattention.{mod}.bias"] = b["cross_attn"][mod]["bias"][i]
        out[f"{pre}.ln_2.weight"] = b["ln_2"]["scale"][i]
        out[f"{pre}.ln_2.bias"] = b["ln_2"]["bias"][i]
    out["transformer.ln_f.weight"] = p["ln_f"]["scale"]
    out["transformer.ln_f.bias"] = p["ln_f"]["bias"]
    out["lm_head.weight"] = p["wte"]["embedding"]
    out["emotion_head.weight"] = p["emotion_head"]["kernel"].T
    for name in ("img_proj", "aud_proj"):
        if name in p:
            out[f"{name}.weight"] = p[name]["kernel"].T
            out[f"{name}.bias"] = p[name]["bias"]
    return out


def load_torch_checkpoint(path: str, config: ModelConfig,
                          rng: Optional[jax.Array] = None) -> Dict[str, Any]:
    """Load a reference .ckpt file (dict with 'model_state_dict',
    src/main.py:186-196) or a bare state dict, as ERGM-TPU params."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    state = blob.get("model_state_dict", blob) if isinstance(blob, dict) else blob
    return hf_to_params(state, config, rng=rng)
