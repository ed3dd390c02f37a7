"""Coverage for pure dispatch/mesh logic: flash eligibility, block-size
selection, mesh construction edge cases, logical sharding cleanup."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from ergm_tpu.core.mesh import (batch_sharding, logical_to_sharding, make_mesh,
                                replicated)
from ergm_tpu.ops.flash_attention import (_pick_block,
                                          flash_attention_supported)


def test_pick_block():
    assert _pick_block(512) == 512
    assert _pick_block(1024) == 512
    assert _pick_block(256) == 256
    assert _pick_block(384) == 128
    assert _pick_block(128) == 128


def _qkv(lq, lk, d=64):
    q = jnp.zeros((1, 2, lq, d))
    k = jnp.zeros((1, 2, lk, d))
    return q, k, k


def test_flash_eligibility_rules():
    # CPU backend -> never eligible (the test env forces CPU)
    q, k, v = _qkv(512, 512)
    assert not flash_attention_supported(q, k, v, causal=True)


def test_flash_shape_rules_monkeypatched(monkeypatch):
    import ergm_tpu.ops.flash_attention as fa

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    ok = lambda lq, lk, **kw: flash_attention_supported(*_qkv(lq, lk), **kw)
    assert ok(512, 512, causal=True)
    assert not ok(64, 512, causal=True)      # q too short
    assert not ok(512, 520, causal=True)     # lk not 128-multiple
    assert not ok(500, 512, causal=True)     # lq not 128-multiple
    assert not ok(512, 512, causal=True, dropout_active=True)
    # rectangular causal (prefill into a longer cache, shared origin) is
    # eligible; a nonzero causal offset is not
    assert ok(256, 512, causal=True)
    assert not ok(256, 512, causal=True, causal_offset=128)
    assert not ok(512, 256, causal=True)  # q longer than kv
    assert ok(256, 512, causal=False)


def test_make_mesh_shapes():
    assert jax.device_count() == 8
    m = make_mesh((-1,), ("data",))
    assert m.shape["data"] == 8
    m2 = make_mesh((2, 2), ("data", "model"))
    assert m2.shape == {"data": 2, "model": 2}  # prefix of devices
    m1 = make_mesh((1,), ("data",))
    assert m1.shape["data"] == 1
    with pytest.raises(ValueError):
        make_mesh((-1, -1), ("a", "b"))
    with pytest.raises(ValueError):
        make_mesh((16,), ("data",))


def test_logical_to_sharding_drops_unknown_axes():
    m = make_mesh((4,), ("data",))
    s = logical_to_sharding(m, P(None, "model"))
    assert s.spec == P(None, None)
    s2 = logical_to_sharding(m, P(None, ("model",)))
    assert s2.spec == P(None, None)


def test_batch_and_replicated_shardings_place_arrays():
    m = make_mesh((8,), ("data",))
    x = jax.device_put(np.zeros((8, 4)), batch_sharding(m))
    assert len(x.sharding.device_set) == 8
    y = jax.device_put(np.zeros((4,)), replicated(m))
    assert y.sharding.is_fully_replicated
