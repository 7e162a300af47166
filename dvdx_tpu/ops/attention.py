"""Multi-head attention primitives.

Single dispatch point for every attention in the framework (spatial self-attn,
temporal self-attn, text cross-attn — the hot loops of the reference's UNet3D
denoise step, `/root/reference/InferNet/neurons/miner.py:571-589`). Two paths:

* ``xla``    — einsum softmax-attention; XLA fuses this well on TPU and it is
  the bit-reference for verification.
* ``pallas`` — fused flash-attention kernel (ops/pallas/flash_attention.py) for
  long sequences; numerically equal within bf16 tolerance, used on the serving
  path where the sequence is big enough to pay off.

All math accumulates in f32 on the MXU (preferred_element_type) regardless of
input dtype.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

# Measured on v5e (S=2880, D=64, bh=160): the single-pass pallas kernel
# (full K/V resident in VMEM, ops/pallas/flash_attention._onepass_kernel)
# runs 10.9 ms vs XLA's materialised-softmax 19.2 ms — 1.76x — and never
# writes S x S logits to HBM. Auto-dispatch uses it for self-attention with
# S >= _PALLAS_MIN_SEQ and head_dim <= 128 (VMEM residency bound). Override
# per-call with impl= or globally via DVDX_ATTN_IMPL.
import os as _os

_PALLAS_MIN_SEQ = int(_os.environ.get("DVDX_ATTN_PALLAS_MIN_SEQ", 512))
_PALLAS_MAX_HEAD_DIM = 128
_FORCED_IMPL = _os.environ.get("DVDX_ATTN_IMPL", "")


def wants_native_mh(s_q: int, s_kv: int, heads: int, head_dim: int) -> bool:
    """True when layers.Attention should take the multi-head-NATIVE pallas
    path (ops/pallas/flash_attention.flash_attention_mh): the kernel consumes
    the projections' (B, S, H*dp) layout directly, eliminating the 4
    head-major transpose copies per call that the classic (B*H, S, D)
    schedule materialises (~9 ms/step std, ~35 ms/step XL — fusion_attrib
    round-4 tail dump). Env override DVDX_ATTN_MH_IMPL: 'xla' disables,
    'pallas' forces intent (still requires TPU + shape gates)."""
    forced = _os.environ.get("DVDX_ATTN_MH_IMPL", "")
    if forced != "pallas":
        # opt-in until the blocked mh schedule beats the classic path
        # in-model (standalone: VMEM-bound at hdp-wide blocks; see
        # benchmarks/attn_mh_ab.py)
        return False
    if head_dim > 128 or s_q < _PALLAS_MIN_SEQ:
        return False
    from .pallas.flash_attention import _divisor_block

    if _divisor_block(s_q, 1024, None) is None:
        return False
    # self-attention, or short cross-attention context (one-pass + mask)
    return s_kv == s_q or s_kv <= 512


def _xla_attention(q, k, v, scale: float) -> jax.Array:
    """q: (B, S, H, D), k/v: (B, T, H, D) -> (B, S, H, D)."""
    logits = jnp.einsum("bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhst,bthd->bshd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


# --- ring context: lets temporal attention run as ring attention when the
# sequence (frame) axis is sharded (exact context parallelism; set during
# tracing by parallel.strategies for cp_exact) -------------------------------

import contextlib as _contextlib
import contextvars as _contextvars

# ContextVar, not a module-global list: a concurrent trace on another thread
# must not see this thread's ring context — the single-device step program is
# the PoI program identity and has to stay byte-identical regardless of what
# other runners are being built in the same process.
_RING_CTX: _contextvars.ContextVar[tuple] = _contextvars.ContextVar(
    "dvdx_ring_ctx", default=())


@_contextlib.contextmanager
def ring_context(mesh, axis_name: str = "seq", algo: str = "ring"):
    """While tracing inside this context, attention calls with impl='ring'
    execute as exact context parallelism over `axis_name` of `mesh`.

    algo: 'ring' (K/V ppermute, works for any head count), 'ulysses'
    (head all-to-all — strict: raises on indivisible heads), or 'auto'
    (ulysses where heads divide the axis, ring elsewhere; the right choice
    for the zeroscope family whose level-0 attention has 5 heads)."""
    if algo not in ("ring", "ulysses", "auto"):
        raise ValueError(f"unknown cp algo {algo!r}")
    token = _RING_CTX.set(_RING_CTX.get() + ((mesh, axis_name, algo),))
    try:
        yield
    finally:
        _RING_CTX.reset(token)


def ring_active() -> bool:
    """True while tracing inside a ring_context (exact-CP strategy). Layers
    whose native layout differs from (B, S, H, D) check this to decide
    whether to re-lay out for ring attention."""
    return bool(_RING_CTX.get())


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: Optional[float] = None,
    impl: str = "auto",
) -> jax.Array:
    """Scaled-dot-product attention over (batch, seq, heads, head_dim).

    impl: 'xla' | 'pallas' | 'auto' | 'ring'. 'auto' picks pallas for long
    self-attn sequences on TPU, xla otherwise. 'ring' runs ring attention
    when a ring_context is active (and the sequence divides the mesh axis),
    else falls through to auto. Deterministic for fixed impl/shape.
    """
    if impl == "ring":
        ring_stack = _RING_CTX.get()
        if ring_stack and q.shape[1] == k.shape[1]:
            mesh, axis_name, algo = ring_stack[-1]
            n = mesh.shape[axis_name]
            if n > 1 and q.shape[1] % n == 0:
                from .ring_attention import ring_attention, ulysses_attention

                if algo == "ulysses" or (algo == "auto"
                                         and q.shape[2] % n == 0):
                    return ulysses_attention(q, k, v, mesh,
                                             axis_name=axis_name, scale=scale)
                return ring_attention(q, k, v, mesh, axis_name=axis_name,
                                      scale=scale)
        impl = "auto"
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if impl == "auto" and _FORCED_IMPL:
        impl = _FORCED_IMPL
    if impl == "auto":
        use_pallas = (
            q.shape[1] >= _PALLAS_MIN_SEQ
            and q.shape[1] == k.shape[1]
            and q.shape[-1] <= _PALLAS_MAX_HEAD_DIM
            and jax.default_backend() == "tpu"
        )
        impl = "pallas" if use_pallas else "xla"
    if impl == "pallas":
        from .pallas.flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale)
    return _xla_attention(q, k, v, scale)
