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
