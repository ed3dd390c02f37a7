"""Text feature extraction: mean-pooled GPT-2 hidden states per utterance.

Capability of src/scripts/text_feature.py:16-28 (the live part above its
sys.exit): run each flattened utterance through GPT-2 and keep the
mean over sequence positions of the final hidden state, pickled per
split. Runs as a jitted program on our backbone instead of a torch loop.

(The dead exploratory code below text_feature.py:38 — a MulT-style
concat-fusion TransformerEncoder over [text; video; audio] — documents a
design the shipped reference replaced with embedding injection + caption
cross-attention, which this framework implements in models/gpt2.py.)
"""

from __future__ import annotations

import argparse
import json
import pickle
from typing import List, Sequence

import numpy as np


def extract_text_features(params, config, utterance_ids: Sequence[Sequence[int]],
                          batch_size: int = 16, pad_multiple: int = 64) -> List[np.ndarray]:
    """Mean-pooled final hidden state per utterance ([hidden] each).

    Pads each batch to a bucketed length; the mean runs over real tokens
    only (the torch reference mean-pools unpadded single sequences).
    """
    import jax
    import jax.numpy as jnp

    from ergm_tpu.models import gpt2

    @jax.jit
    def run(ids, mask):
        hidden, _ = gpt2.transformer(params, config, ids, attention_mask=mask)
        denom = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
        return jnp.sum(hidden * mask[..., None], axis=1) / denom

    feats: List[np.ndarray] = []
    for s in range(0, len(utterance_ids), batch_size):
        chunk = utterance_ids[s:s + batch_size]
        longest = max(len(u) for u in chunk)
        L = min(((longest + pad_multiple - 1) // pad_multiple) * pad_multiple,
                config.n_positions)
        ids = np.zeros((batch_size, L), np.int32)
        mask = np.zeros((batch_size, L), np.float32)
        for i, u in enumerate(chunk):
            u = list(u)[:L]
            ids[i, :len(u)] = u
            mask[i, :len(u)] = 1.0
        out = np.asarray(run(jnp.asarray(ids), jnp.asarray(mask)))
        feats.extend(out[:len(chunk)])
    return feats


def main(argv=None):
    p = argparse.ArgumentParser(description="Mean-pooled GPT-2 text features")
    p.add_argument("--input_json", required=True,
                   help="JSON list of utterance token-id lists "
                        "(e.g. a flattened *_sent_emo_ids.json).")
    p.add_argument("--output_file", required=True)
    p.add_argument("--model_type", default="gpt2")
    p.add_argument("--init_params", default=None,
                   help="Orbax params dir (cli/convert_ckpt.py); random init "
                        "otherwise.")
    p.add_argument("--vocab_size", type=int, default=50257)
    args = p.parse_args(argv)

    import jax

    from ergm_tpu.core.config import ModelConfig
    from ergm_tpu.models import gpt2

    cfg = ModelConfig.from_model_type(args.model_type, vocab_size=args.vocab_size,
                                      dtype="bfloat16")
    params = gpt2.init_params(jax.random.PRNGKey(0), cfg)
    if args.init_params:
        from ergm_tpu.train.checkpoint import restore_params

        params = restore_params(args.init_params, params)

    with open(args.input_json) as f:
        utterances = json.load(f)
    flat = [u if u and isinstance(u[0], int) else [t for turn in u for t in turn]
            for u in utterances]
    feats = extract_text_features(params, cfg, flat)
    with open(args.output_file, "wb") as f:
        pickle.dump(feats, f)
    print(f"{len(feats)} utterance features -> {args.output_file}")


if __name__ == "__main__":
    main()
