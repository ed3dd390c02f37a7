"""Probe: does splitting the serving decode into length-tiered slot
groups pay at the documented long-mix shapes?

The continuous server's known trade (README "Mixed long-prompt traffic"):
one long LIVE row raises the global capacity rung, and every slot's
decode then reads the wide cache — offline throughput 97 -> 25 utt/s on
the 8%-long mix. This probe measures the candidate fix BEFORE building
it: one decode step over

  (a) S=64 slots @ T=1024   (today: global rung)
  (b) S=56 @ T=192 + S=8 @ T=1024 as TWO forwards in ONE program
      (tiered pools: short rows keep a narrow cache)
  (c) S=64 @ T=192          (lower bound: no long rows at all)

gpt2 geometry, bf16, random params, sync_every=32 steps per block (the
throughput config the mix bench uses). Prints ms/step for each.
"""
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ergm_tpu.core.config import ModelConfig
from ergm_tpu.models import gpt2


def make_block(cfg, caches_spec, sync):
    """caches_spec: list of (n_slots, t_phys). Returns jitted block fn
    taking (params, caches..., last) and advancing `sync` steps."""

    @jax.jit
    def block(params, caches, last):
        def body(i, st):
            caches, last = st
            outs = []
            new_caches = []
            off = 0
            for (S, _T), cache in zip(caches_spec, caches):
                sub_last = lax.dynamic_slice_in_dim(last, off, S, axis=0)
                pos = jnp.minimum(cache.index, cfg.n_positions - 1)[:, None]
                out = gpt2.forward(params, cfg, sub_last, position_ids=pos,
                                   cache=cache)
                outs.append(jnp.argmax(out.logits[:, -1, :], -1)
                            .astype(jnp.int32))
                new_caches.append(out.cache)
                off += S
            nxt = jnp.concatenate(outs)[:, None]
            return (tuple(new_caches), nxt)

        caches, last = lax.fori_loop(0, sync, body, (caches, last))
        # anchor to the final caches so the loop can't be DCE'd; fetching
        # this scalar is the synchronization point (block_until_ready
        # does not synchronize under the tunneled transport)
        anchor = sum(jnp.sum(c.k[:, :, :, -1].astype(jnp.float32))
                     for c in caches)
        return last, anchor

    return block


def measure(cfg, params, caches_spec, sync=32, iters=5):
    caches = tuple(
        gpt2.init_kv_cache(cfg, S, T, per_row_index=True)._replace(
            index=jnp.full((S,), T - sync - 2, jnp.int32))
        for S, T in caches_spec)
    S_total = sum(S for S, _ in caches_spec)
    last = jnp.zeros((S_total, 1), jnp.int32)
    fn = make_block(cfg, caches_spec, sync)
    t0 = time.time()
    np.asarray(fn(params, caches, last)[1])
    compile_s = time.time() - t0
    # chained dispatches; one fetch at the end (device executions
    # serialize) amortizes the tunnel round trip
    t0 = time.time()
    outs = [fn(params, caches, last) for _ in range(iters)]
    for o in outs:
        np.asarray(o[1])
    dt = (time.time() - t0) / iters / sync * 1e3
    return dt, compile_s


def main():
    cfg = ModelConfig.from_model_type("gpt2")
    cfg = cfg.replace(use_cross_attention=False, dtype="bfloat16")
    params = gpt2.init_params(jax.random.PRNGKey(0), cfg)
    for name, spec in [
        ("a_global_wide S=64@1024", [(64, 1024)]),
        ("b_tiered S=56@192+8@1024", [(56, 192), (8, 1024)]),
        ("c_all_narrow S=64@192", [(64, 192)]),
    ]:
        ms, comp = measure(cfg, params, spec)
        print(f"{name}: {ms:.3f} ms/step (compile {comp:.1f}s)")


if __name__ == "__main__":
    main()
