"""Counter-based deterministic noise generation.

The reference anchors determinism on ``torch.manual_seed(seed)`` right before
sampling the base latent (`/root/reference/InferNet/neurons/miner.py:508-510`,
`Distribution/strategies/chunk_only.py:109-113` — "shared base noise, seed 0").
That is a *global sequential* RNG: every rank must draw the full latent even
when it only works on a slice of frames.

TPU-native replacement: counter-based keys.  ``frame_noise(key, f, ...)`` is a
pure function of (seed, frame index), so

* every shard of a frame-sharded mesh materialises exactly its own frames (plus
  halo frames) bit-identically to what a single device would draw, with zero
  communication — the "shared base noise" property for free;
* the validator re-derives any miner's base latent from the 64-bit seed alone.

Seeds are 64-bit python ints (HMAC-derived in verify/proof.py, mirroring
reference `template/validator/proof.py:11-18`); they are split into two uint32
words host-side so nothing depends on jax_enable_x64.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "base_key",
    "frame_noise",
    "video_noise",
    "frame_range_noise",
    "aux_noise",
]


def base_key(seed: int) -> jax.Array:
    """64-bit python-int seed -> JAX PRNG key (host-side, untraced)."""
    seed = int(seed) & 0xFFFFFFFFFFFFFFFF
    hi = np.uint32(seed >> 32)
    lo = np.uint32(seed & 0xFFFFFFFF)
    key = jax.random.key(0)
    key = jax.random.fold_in(key, hi)
    key = jax.random.fold_in(key, lo)
    return key


def frame_noise(key: jax.Array, frame_idx, shape, dtype=jnp.float32) -> jax.Array:
    """N(0,1) noise for one frame. `shape` is the per-frame latent shape
    (H, W, C). Pure function of (key, frame_idx); frame_idx may be traced."""
    k = jax.random.fold_in(key, jnp.asarray(frame_idx, jnp.uint32))
    return jax.random.normal(k, shape, dtype=dtype)


def frame_range_noise(key: jax.Array, start, num_frames: int, shape, dtype=jnp.float32):
    """Noise for frames [start, start+num_frames) stacked on axis 0.

    `num_frames` is static; `start` may be traced (shard-local generation
    inside shard_map). Returns (num_frames, *shape).
    """
    idx = jnp.arange(num_frames, dtype=jnp.uint32) + jnp.asarray(start, jnp.uint32)
    return jax.vmap(lambda i: frame_noise(key, i, shape, dtype))(idx)


def video_noise(key: jax.Array, num_frames: int, shape, dtype=jnp.float32) -> jax.Array:
    """Full base latent (num_frames, H, W, C) for a PRNG key."""
    return frame_range_noise(key, 0, num_frames, shape, dtype)


AUX_SALT = 0xAE0B5EED  # keeps aux streams disjoint from frame-index folds


def aux_noise(key: jax.Array, x: jax.Array, tag: int) -> jax.Array:
    """Auxiliary deterministic noise stream (e.g. SVD conditioning
    augmentation, stochastic DDIM eta>0). Salted into a key domain disjoint
    from frame_noise's fold_in(frame_idx) — without the salt, aux tag t would
    be bit-identical to base-noise frame t."""
    k = jax.random.fold_in(key, jnp.uint32(AUX_SALT))
    k = jax.random.fold_in(k, jnp.uint32(tag))
    return jax.random.normal(k, x.shape, x.dtype)
