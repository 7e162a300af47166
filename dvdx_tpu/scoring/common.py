"""Shared scoring-path helpers."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def as_device_u8(frames_uint8) -> jax.Array:
    """uint8 frames (host numpy or device array) -> device array, one put.

    The single coercion point for every scoring program (CLIP, LPIPS, the
    perceptual proxy, authenticity stats): callers that already device_put
    the frames pass the same array through untouched, so one 42 MB transfer
    (XL geometry) serves all programs.
    """
    if isinstance(frames_uint8, jax.Array):
        return frames_uint8
    return jnp.asarray(np.ascontiguousarray(frames_uint8))
