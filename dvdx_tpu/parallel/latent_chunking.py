"""Reusable latent chunk/stitch public API.

The reference ships a standalone `LatentChunker` library with
`split_latent` / `stitch_chunks` and a `DistributedZeroscopeGenerator`
(`/root/reference/Distribution/legacy/Latent Chunking/latent_chunking.py:21-419`)
plus a file-based restitcher (`stitch_chunks.py:18-181`). This module is the
supported equivalent, thin over parallel.chunking's XLA gather/scatter — kept
as an explicit API because external tools (the coordinator/worker runtime,
notebook analysis) operate on chunk arrays directly.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from .chunking import ChunkPlan, blend_chunks, gather_chunks, plan_chunks


def split_latent(latent: np.ndarray, num_chunks: int, overlap: int = 2
                 ) -> Tuple[List[np.ndarray], ChunkPlan]:
    """(F, ...) -> list of (L, ...) overlapping chunks + the plan.

    Equivalent of LatentChunker.split_latent; numpy in/out so it composes with
    any runtime (the chunks can be shipped to remote workers).
    """
    latent = np.asarray(latent)
    plan = plan_chunks(latent.shape[0], num_chunks, overlap)
    return [latent[plan.frame_index[i]] for i in range(plan.num_chunks)], plan


def stitch_chunks(chunks: List[np.ndarray], plan: ChunkPlan) -> np.ndarray:
    """Inverse of split_latent with linear-ramp overlap blending."""
    import jax.numpy as jnp

    arr = jnp.asarray(np.stack(chunks))[None]  # (1, n, L, ...)
    out = blend_chunks(arr, plan)[0]
    return np.asarray(out)


def chunk_bounds(plan: ChunkPlan) -> List[Tuple[int, int]]:
    """[(start, end), ...] global frame ranges per chunk."""
    return [(int(r[0]), int(r[-1]) + 1) for r in plan.frame_index]
