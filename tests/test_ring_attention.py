"""Ring attention on the 8-device CPU mesh vs global attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvdx_tpu.ops.attention import _xla_attention
from dvdx_tpu.ops.ring_attention import ring_attention
from dvdx_tpu.parallel.mesh import make_mesh


@pytest.mark.parametrize("b,s,h,d", [(2, 64, 2, 16), (1, 128, 4, 32)])
def test_ring_matches_global(b, s, h, d):
    mesh = make_mesh((1, 1, 8))
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    ref = _xla_attention(q, k, v, d**-0.5)
    out = jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)


def test_ring_memory_stays_sharded():
    """Output sharding matches input sharding (sequence stays distributed)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh((1, 1, 8))
    sh = NamedSharding(mesh, P(None, "seq", None, None))
    q = jax.device_put(jnp.ones((1, 64, 2, 16)), sh)
    out = jax.jit(lambda q: ring_attention(q, q, q, mesh))(q)
    assert out.sharding.spec == P(None, "seq", None, None)


# --- Ulysses (head all-to-all) CP -------------------------------------------


@pytest.mark.parametrize("b,s,h,d", [(2, 64, 8, 16), (1, 128, 16, 32)])
def test_ulysses_matches_global(b, s, h, d):
    from dvdx_tpu.ops.ring_attention import ulysses_attention

    mesh = make_mesh((1, 1, 8))
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    ref = _xla_attention(q, k, v, d**-0.5)
    out = jax.jit(lambda q, k, v: ulysses_attention(q, k, v, mesh))(q, k, v)
    # each head's softmax runs in ONE piece (no blockwise recurrence), so
    # the tolerance is tighter than ring's accumulation-order bound
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)


def test_ulysses_rejects_indivisible_heads():
    from dvdx_tpu.ops.ring_attention import ulysses_attention

    mesh = make_mesh((1, 1, 8))
    q = jnp.ones((1, 64, 5, 16))  # zeroscope level-0 head count
    with pytest.raises(ValueError, match="divisible"):
        jax.jit(lambda q: ulysses_attention(q, q, q, mesh))(q)


def test_cp_auto_algo_dispatches_per_head_count():
    """Inside ring_context(algo='auto'), divisible-head shapes take the
    ulysses path (all-to-all in the SPMD module), 5-head shapes fall back to
    ring (collective-permute) — both in one program, matching the zeroscope
    family's mixed head counts."""
    from dvdx_tpu.ops.attention import multi_head_attention, ring_context

    mesh = make_mesh((1, 1, 8))

    def lowered_text(h):
        def fn(q):
            with ring_context(mesh, "seq", algo="auto"):
                return multi_head_attention(q, q, q, impl="ring")
        q = jnp.ones((1, 64, h, 16))
        return jax.jit(fn).lower(q).compile().as_text()

    assert "all-to-all" in lowered_text(8)
    assert "collective-permute" in lowered_text(5)
