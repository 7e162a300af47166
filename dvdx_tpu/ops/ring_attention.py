"""Ring attention over a sharded sequence axis.

The idiomatic TPU realisation of long-video temporal attention (SURVEY.md §7
step 4): the frame axis lives sharded across the mesh `seq` axis; K/V shards
rotate around the ring via ppermute while each device accumulates its local
queries' online softmax — full global attention with O(S/n) memory per device
and comm that overlaps compute. The reference's only long-sequence mechanism
is overlapping chunk blending with measured boundary artefacts
(`chunk_only.py:88-150`); ring attention gives the *exact* result.

Implemented with shard_map + jax.lax.ppermute (XLA schedules the collective
permutes on ICI); the blockwise softmax math matches
ops/pallas/flash_attention's recurrence, so results equal global attention up
to f32-accumulation order.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .attention import _xla_attention

NEG_INF = -1e30


def _local_block(q, k, v, scale):
    """Blockwise stats for one (q_local, k_block): returns (o_unnorm, m, l).
    q: (B, Sq, H, D), k/v: (B, Sk, H, D)."""
    logits = jnp.einsum("bshd,bthd->bhst", q, k,
                        preferred_element_type=jnp.float32) * scale
    m = jnp.max(logits, axis=-1, keepdims=True)              # (B,H,Sq,1)
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bhst,bthd->bshd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)        # (B,Sq,H,D) f32
    return o, m, l


def _ring_body(axis_name: str, scale: float, q, k, v):
    """Runs on each shard: q/k/v are the LOCAL (B, S_loc, H, D) blocks."""
    n = jax.lax.psum(1, axis_name)

    o, m, l = _local_block(q, k, v, scale)

    def step(i, carry):
        o, m, l, k, v = carry
        # rotate k/v to the next device on the ring
        perm = [(j, (j + 1) % n) for j in range(n)]
        k = jax.lax.ppermute(k, axis_name, perm)
        v = jax.lax.ppermute(v, axis_name, perm)
        o_b, m_b, l_b = _local_block(q, k, v, scale)
        m_new = jnp.maximum(m, m_b)
        alpha = jnp.exp(m - m_new)
        beta = jnp.exp(m_b - m_new)
        # stats are (B,H,Sq,1); outputs are (B,Sq,H,D) — transpose the scale
        sa = jnp.transpose(alpha, (0, 2, 1, 3))
        sb = jnp.transpose(beta, (0, 2, 1, 3))
        o = o * sa + o_b * sb
        l = l * alpha + l_b * beta
        return o, m_new, l, k, v

    o, m, l, _, _ = jax.lax.fori_loop(0, n - 1, step, (o, m, l, k, v))
    return (o / jnp.transpose(l, (0, 2, 1, 3))).astype(q.dtype)


def ring_attention(q, k, v, mesh: Mesh, *, axis_name: str = "seq",
                   scale: Optional[float] = None):
    """Global self-attention with the sequence axis sharded over `axis_name`.

    q/k/v: (B, S, H, D) with S sharded over the mesh axis. Returns (B, S, H, D)
    with the same sharding. S must divide evenly by the axis size.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    spec = P(None, axis_name, None, None)
    fn = jax.shard_map(
        functools.partial(_ring_body, axis_name, float(scale)),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
    )
    return fn(q, k, v)


# --- Ulysses (DeepSpeed-style) sequence parallelism ---------------------------
#
# Two all-to-alls instead of n-1 ring hops: re-shard (B, S/n, H, D) ->
# (B, S, H/n, D), run FULL attention per local head, re-shard back. For the
# short frame axes of video diffusion (16-24 frames) this is the cheaper
# collective pattern (CoCoDiff, arXiv:2604.14561, analyses the same trade for
# DiT serving), and — unlike the ring's blockwise online softmax — each head's
# softmax/contraction runs in ONE piece, so per-head results are bitwise the
# single-device attention (only the layout moves). Requires heads % n == 0;
# the 'auto' CP algorithm falls back to ring attention where it does not
# (the zeroscope level-0 temporal attention has 5 heads).


def _ulysses_body(axis_name: str, scale: float, q, k, v):
    """Per-shard: q/k/v (B, S_loc, H, D) -> (B, S_loc, H, D)."""

    def to_heads(x):  # (B, S_loc, H, D) -> (B, S, H_loc, D)
        return jax.lax.all_to_all(x, axis_name, split_axis=2, concat_axis=1,
                                  tiled=True)

    o = _xla_attention(to_heads(q), to_heads(k), to_heads(v), scale)
    # back to sequence sharding: split S, concat local heads
    return jax.lax.all_to_all(o, axis_name, split_axis=1, concat_axis=2,
                              tiled=True)


def ulysses_attention(q, k, v, mesh: Mesh, *, axis_name: str = "seq",
                      scale: Optional[float] = None):
    """Global self-attention, sequence axis sharded, via head all-to-all.

    q/k/v: (B, S, H, D) with S sharded over `axis_name`. S AND H must divide
    the axis size (callers route indivisible-head shapes to ring_attention).
    """
    n = mesh.shape[axis_name]
    if q.shape[2] % n:
        raise ValueError(
            f"ulysses needs heads ({q.shape[2]}) divisible by the mesh axis "
            f"({n}); use ring_attention (or cp_algo='auto') instead")
    if scale is None:
        scale = q.shape[-1] ** -0.5
    spec = P(None, axis_name, None, None)
    fn = jax.shard_map(
        functools.partial(_ulysses_body, axis_name, float(scale)),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
    )
    return fn(q, k, v)
