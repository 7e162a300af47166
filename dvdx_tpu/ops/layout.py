"""Spatial fold order for (B, F, H, W, C) video activations.

Every spatial op in the UNet folds frames into the batch dim so convs and
attention run as one large MXU-friendly batch (unet3d.py module docstring).
The fold ORDER decides whether a frame-axis sharding survives GSPMD:

* batch-major (B*F): row = b*F + f. With F sharded over the mesh `seq` axis
  and B replicated, the merged dim is INTERLEAVED-sharded — not expressible
  as a GSPMD tiling — so XLA all-gathers and every spatial activation is
  replicated per chip (the ~11.7 GB/chip cp_exact residual measured in
  docs/PERF_NOTES.md round 2).
* frames-major (F*B): row = f*B + b. The sharded factor is the MAJOR one, so
  each shard owns a contiguous (F/s)*B row block — exactly a P('seq') tiling
  of the merged dim — and GSPMD keeps every spatial conv/attention sharded
  over frames with zero redundant compute.

The exact-CP strategy (parallel/strategies.py) traces the UNet inside
`frames_major()`; everything else keeps the batch-major fold, so the
single-device step program — the PoI program identity
(verify/spotcheck.StepEngine) — is byte-for-byte unchanged.

Reference context: the reference's only memory scaling is overlapped chunking
(`/root/reference/Distribution/strategies/chunk_only.py:80-150`), which pays
overlap recompute; exact CP has no overlap, so its per-chip activation floor
is 1/seq — but only if the fold order lets the sharding propagate.
"""

from __future__ import annotations

import contextlib
import contextvars

import jax.numpy as jnp

# ContextVar, not a module-global: a concurrent trace on another thread must
# never see this thread's fold order — the batch-major single-device step
# program is the PoI program identity (verify/spotcheck.StepEngine) and has
# to stay byte-identical no matter what other runners are being traced in
# the same process.
_FRAMES_MAJOR: contextvars.ContextVar[bool] = contextvars.ContextVar(
    "dvdx_frames_major", default=False)


@contextlib.contextmanager
def frames_major():
    """While tracing inside this context, spatial folds are frames-major."""
    token = _FRAMES_MAJOR.set(True)
    try:
        yield
    finally:
        _FRAMES_MAJOR.reset(token)


def frames_major_active() -> bool:
    return _FRAMES_MAJOR.get()


def fold_frames(x):
    """(B, F, *rest) -> (B*F, *rest) batch-major, or (F*B, *rest) frames-major."""
    b, f = x.shape[0], x.shape[1]
    if _FRAMES_MAJOR.get():
        return jnp.swapaxes(x, 0, 1).reshape((f * b,) + x.shape[2:])
    return x.reshape((b * f,) + x.shape[2:])


def unfold_frames(xs, b: int, f: int):
    """Inverse of fold_frames: (N, *rest) -> (B, F, *rest)."""
    if _FRAMES_MAJOR.get():
        return jnp.swapaxes(xs.reshape((f, b) + xs.shape[1:]), 0, 1)
    return xs.reshape((b, f) + xs.shape[1:])


def per_frame(t, f: int):
    """Broadcast a per-batch tensor (B, *rest) to one row per folded frame,
    matching fold_frames' row order: batch-major repeats each batch row f
    times; frames-major tiles the batch block f times."""
    if _FRAMES_MAJOR.get():
        return jnp.tile(t, (f,) + (1,) * (t.ndim - 1))
    return jnp.repeat(t, f, axis=0)
