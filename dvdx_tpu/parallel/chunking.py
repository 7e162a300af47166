"""Temporal latent chunking: plan, gather, ramp-blend.

The reference splits the latent along the frame axis into overlapping chunks,
denoises each independently, and stitches with linear-ramp overlap blending
(`/root/reference/Distribution/strategies/chunk_only.py:80-150`, divisibility
adjustment `fsdp_chunked.py:146-171`). Ranks exchange pickled CPU tensors via
`all_gather_object`.

TPU-native formulation: chunking is a *static gather* (frames -> (n_chunks, L))
and blending is a *weighted scatter-add* — both pure XLA ops on device. The
chunk axis folds into the batch axis and is sharded over the mesh's `seq` axis,
so "which rank owns which chunk" becomes a sharding annotation and the stitch
is whatever collective GSPMD emits (an ICI all-gather), not host pickling.

All planning is host-side numpy with static shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ChunkPlan:
    """Static chunking layout.

    frame_index: (n_chunks, L) int32 — global frame id per chunk slot.
    weights:     (n_chunks, L) f32   — ramp blend weight per chunk slot.
    num_frames:  original frame count F.
    """

    frame_index: np.ndarray
    weights: np.ndarray
    num_frames: int

    @property
    def num_chunks(self) -> int:
        return int(self.frame_index.shape[0])

    @property
    def chunk_len(self) -> int:
        return int(self.frame_index.shape[1])


def auto_chunk_count(num_frames: int, num_shards: int, target_len: int = 8) -> int:
    """Pick a chunk count: at least one chunk per shard, chunks near
    target_len frames (reference auto-sizing `chunk_only.py:80-106`)."""
    by_len = max(1, round(num_frames / target_len))
    n = max(num_shards, by_len)
    # round up to a multiple of num_shards for even sharding
    if n % num_shards:
        n += num_shards - n % num_shards
    return min(n, num_frames)


def plan_chunks(num_frames: int, num_chunks: int, overlap: int = 2) -> ChunkPlan:
    """Evenly-spaced overlapping chunks covering [0, F).

    All chunks share one static length L (batched execution). Starts are
    evenly spaced; L = F when num_chunks == 1. Overlap is the minimum frames
    shared with each neighbour; blend weights ramp linearly across the actual
    overlap region with each neighbour (the reference's linear-ramp stitch,
    `chunk_only.py:136-150`), and are 1 at the global video boundaries.
    """
    if num_chunks <= 1:
        idx = np.arange(num_frames, dtype=np.int32)[None]
        w = np.ones((1, num_frames), np.float32)
        return ChunkPlan(idx, w, num_frames)

    # length so consecutive chunks overlap by >= `overlap`
    stride = (num_frames - overlap) / num_chunks
    length = int(np.ceil(stride)) + overlap
    length = min(max(length, overlap + 1), num_frames)
    starts = np.round(np.linspace(0, num_frames - length, num_chunks)).astype(np.int64)

    idx = starts[:, None] + np.arange(length)[None, :]
    idx = idx.astype(np.int32)

    # blend weights: ramp up over the region overlapped with the previous
    # chunk, ramp down over the region overlapped with the next chunk
    w = np.ones((num_chunks, length), np.float32)
    pos = idx.astype(np.float64)
    for i in range(num_chunks):
        s, e = starts[i], starts[i] + length  # [s, e)
        if i > 0:
            prev_end = starts[i - 1] + length
            ov = max(0, min(prev_end, e) - s)  # frames shared with previous
            if ov > 0:
                ramp = (np.arange(ov) + 1) / (ov + 1)
                w[i, :ov] *= ramp
        if i < num_chunks - 1:
            nxt_start = starts[i + 1]
            ov = max(0, e - max(nxt_start, s))
            if ov > 0:
                ramp = (np.arange(ov)[::-1] + 1) / (ov + 1)
                w[i, length - ov:] *= ramp
    return ChunkPlan(idx, w, num_frames)


def gather_chunks(latent: jax.Array, plan: ChunkPlan) -> jax.Array:
    """(B, F, h, w, C) -> (B, n_chunks, L, h, w, C) by static gather."""
    idx = jnp.asarray(plan.frame_index)  # (n, L)
    return jnp.take(latent, idx, axis=1)


def blend_chunks(chunks: jax.Array, plan: ChunkPlan) -> jax.Array:
    """(B, n_chunks, L, h, w, C) -> (B, F, h, w, C) weighted scatter-add.

    out[f] = sum_i w[i,j] * chunks[i,j] / sum_i w[i,j] over slots with
    frame_index[i,j] == f. Exactly the reference stitch semantics
    (`chunk_only.py:136-150`: full/weight), as one XLA segment-sum.
    """
    b, n, l = chunks.shape[:3]
    rest = chunks.shape[3:]
    w = jnp.asarray(plan.weights, chunks.dtype).reshape(1, n, l, *([1] * len(rest)))
    weighted = (chunks * w).reshape(b, n * l, *rest)
    wflat = jnp.broadcast_to(w, (1, n, l) + tuple([1] * len(rest))).reshape(1, n * l, *([1] * len(rest)))
    seg = jnp.asarray(plan.frame_index.reshape(-1), jnp.int32)

    num = jax.vmap(
        lambda x: jax.ops.segment_sum(x, seg, num_segments=plan.num_frames)
    )(weighted)
    den = jax.ops.segment_sum(
        jnp.broadcast_to(wflat[0], (n * l,) + tuple([1] * len(rest))), seg,
        num_segments=plan.num_frames,
    )
    return num / den


def chunk_frame_positions(plan: ChunkPlan) -> jax.Array:
    """Relative positions (L,) — each chunk is denoised as an independent
    clip, matching the reference's per-chunk processing."""
    return jnp.arange(plan.chunk_len)
