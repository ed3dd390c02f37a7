"""Worker process for the 2-process multi-host test (test_multihost.py).

Each process: initializes jax.distributed over localhost, builds a
global 4-device mesh (2 hosts x 2 virtual CPU devices), loads ITS OWN
per-host shard of the synthetic dataset (the grain_loader convention),
assembles global batches with jax.make_array_from_process_local_data
(train/steps.py batch_to_device), runs sharded train steps, then saves
and restores an orbax checkpoint collectively.

Prints one line per step: ``STEP <i> LOSS <value>`` — the parent
asserts both processes print identical losses (proof the global batch
and gradient all-reduce are consistent), plus ``RESTORED OK`` after the
checkpoint round-trip.
"""

import os
import sys


def main():
    coordinator, pid_s, data_dir, ckpt_dir = sys.argv[1:5]
    pid = int(pid_s)
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    import jax

    jax.distributed.initialize(coordinator, num_processes=2, process_id=pid)
    assert jax.process_count() == 2 and len(jax.devices()) == 4

    import numpy as np
    import optax

    from ergm_tpu.core.config import ModelConfig
    from ergm_tpu.core.mesh import make_mesh, replicated
    from ergm_tpu.data.assembly import read_meta
    from ergm_tpu.data.dataset import (DialogueDataset, Subset, batches,
                                       host_shard_order)
    from ergm_tpu.models import gpt2
    from ergm_tpu.train import checkpoint as ckpt_lib
    from ergm_tpu.train.steps import (batch_to_device, create_train_state,
                                      make_train_step)

    st = read_meta(data_dir)
    mcfg = ModelConfig(vocab_size=st.vocab_size, n_positions=64, n_embd=32,
                       n_layer=2, n_head=4, use_cross_attention=False,
                       dtype="float32", embd_pdrop=0.0, attn_pdrop=0.0,
                       resid_pdrop=0.0)
    mesh = make_mesh((4,), ("data",))

    # params replicated across the GLOBAL mesh: init on-device under jit
    # so every host holds identical values without host-side transfers
    params = jax.jit(lambda: gpt2.init_params(jax.random.PRNGKey(0), mcfg),
                     out_shardings=replicated(mesh))()
    tx = optax.adamw(1e-3)
    state = create_train_state(params, tx)
    step_fn = make_train_step(mcfg, tx)

    ds = DialogueDataset("train", data_dir, sp1_id=st.sp1_id, sp2_id=st.sp2_id,
                         eos_id=st.eos_id, max_len=64)
    # globally-shuffled per-host shard — the Trainer._batches convention
    # (same epoch seed on every process => disjoint consistent shards)
    ds = Subset(ds, host_shard_order(len(ds), pid, 2, shuffle=True, seed=7))

    rng = jax.random.PRNGKey(0)
    with mesh:
        # static=True (the trainer's multi-host mode): each host's local
        # batch has different example lengths, so dynamic buckets would
        # give the processes different global shapes — pad to max_len
        for i, batch in enumerate(batches(ds, 4, st.eos_id, max_len=64,
                                          drop_remainder=True, static=True,
                                          pad_multiple=32)):
            assert batch.input_ids.shape[1] == 64, batch.input_ids.shape
            # local batch of 4 -> global batch of 8 over the data axis
            dev = batch_to_device(batch, mesh)
            assert dev["input_ids"].shape[0] == 8, dev["input_ids"].shape
            state, metrics = step_fn(state, dev, rng)
            print(f"STEP {i} LOSS {float(metrics['loss']):.6f}", flush=True)
            if i >= 2:
                break

        path = ckpt_lib.save_checkpoint(ckpt_dir, state, epoch=1, best_ppl=3.14)
        restored = ckpt_lib.restore_checkpoint(path, state)
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(restored["state"].params)):
            np.testing.assert_allclose(np.asarray(jax.device_get(a)),
                                       np.asarray(jax.device_get(b)), atol=0)
        assert restored["epoch"] == 1
        print("RESTORED OK", flush=True)


if __name__ == "__main__":
    main()
