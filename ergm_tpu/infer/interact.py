"""Interactive dialogue REPL over the KV-cached decoder.

An addition beyond the reference CLI (its modes are train/infer only,
src/main.py:341): type utterances, the model replies; the dialogue
window is re-assembled per turn with the same convention as training
data (ergm_tpu/data/assembly.py: bos + alternating sp1/sp2 turns), so a
trained checkpoint behaves as in evaluation. ``max_turns`` truncates the
history window (the flag the reference parses but never uses —
SURVEY.md §2.4.8).
"""

from __future__ import annotations

import sys
from typing import List, Optional

import jax
import numpy as np

from ergm_tpu.core.config import ModelConfig
from ergm_tpu.core.tokens import SpecialTokens
from ergm_tpu.infer.generate import generate_batch


class DialogueSession:
    def __init__(self, params, config: ModelConfig, st: SpecialTokens,
                 tokenizer=None, max_len: int = 1024, max_turns: Optional[int] = None,
                 top_p: float = 0.95, seed: int = 0, mesh=None,
                 draft_layers: int = 0, spec_gamma: int = 4):
        self.params = params
        self.mesh = mesh
        self.draft_layers = draft_layers
        self.spec_gamma = spec_gamma
        self.config = config
        self.st = st
        self.tokenizer = tokenizer
        self.max_len = min(max_len, config.n_positions)
        self.max_turns = max_turns
        self.top_p = top_p
        self.rng = jax.random.PRNGKey(seed)
        self.turns: List[List[int]] = []  # token ids per utterance

    def _encode(self, text: str) -> List[int]:
        if self.tokenizer is None:
            raise ValueError("interactive mode needs a tokenizer "
                             "(pass --tokenizer_dir)")
        return self.tokenizer.encode(text)

    def _decode(self, ids: List[int]) -> str:
        return self.tokenizer.decode(ids, skip_special_tokens=True)

    def _window(self):
        from ergm_tpu.data.assembly import build_window

        turns = self.turns
        # window for a NEXT (model) turn: treat it like predicting
        # utterance len(turns); build_window targets an existing index, so
        # append a placeholder and strip its tokens.
        fake = turns + [[]]
        w = build_window(fake, len(fake) - 1, self.st,
                         max_turns=self.max_turns, max_len=self.max_len)
        flat, tts = [], []
        # token types follow the window-parity rule the dataset uses
        # (ergm_tpu/data/dataset.py token_types)
        for c, turn in enumerate(w):
            sp = self.st.sp1_id if c % 2 == 0 else self.st.sp2_id
            flat.extend(turn)
            tts.extend([sp] * len(turn))
        return flat[:-1], tts[:-1]  # drop the placeholder's trailing eos

    def reply(self, user_text: str, max_new_tokens: int = 64) -> str:
        self.turns.append(self._encode(user_text))
        prompt, tts = self._window()
        self.rng, key = jax.random.split(self.rng)
        outs, _ = generate_batch(
            self.params, self.config, [prompt], token_types=[tts],
            max_len=self.max_len,
            eos_id=self.st.eos_id, sp2_id=self.st.sp2_id, top_p=self.top_p,
            rng=key, max_new_tokens=max_new_tokens, mesh=self.mesh,
            draft_layers=self.draft_layers, spec_gamma=self.spec_gamma)
        reply_ids = [t for t in outs[0] if t != self.st.eos_id]
        self.turns.append(reply_ids)
        return self._decode(reply_ids)


def run_repl(params, config, st, tokenizer, *, max_len=1024, max_turns=None,
             top_p=0.95, seed=0, stdin=None, stdout=None, mesh=None,
             draft_layers=0, spec_gamma=4):
    stdin = stdin or sys.stdin
    stdout = stdout or sys.stdout
    session = DialogueSession(params, config, st, tokenizer,
                              max_len=max_len, max_turns=max_turns,
                              top_p=top_p, seed=seed, mesh=mesh,
                              draft_layers=draft_layers,
                              spec_gamma=spec_gamma)
    print("Interactive dialogue (empty line or Ctrl-D to quit).", file=stdout)
    for line in stdin:
        text = line.strip()
        if not text:
            break
        try:
            reply = session.reply(text)
        except Exception as e:  # surface, keep the session alive
            print(f"[error: {e}]", file=stdout)
            continue
        print(f"model> {reply}", file=stdout)
    print("bye.", file=stdout)
