"""Counter-based noise: shard-local generation must equal global generation.

This property replaces the reference's 'shared base noise via torch.manual_seed'
(`chunk_only.py:109-113`) and is what makes frame-sharded strategies
communication-free at init.
"""

import jax.numpy as jnp
import numpy as np

from dvdx_tpu.ops import rng as rng_ops


def test_frame_range_matches_full():
    key = rng_ops.base_key(1234567890123456789)
    full = rng_ops.video_noise(key, 16, (4, 4, 4))
    part = rng_ops.frame_range_noise(key, 5, 6, (4, 4, 4))
    np.testing.assert_array_equal(np.asarray(full[5:11]), np.asarray(part))


def test_seed_sensitivity():
    a = rng_ops.video_noise(rng_ops.base_key(1), 4, (2, 2, 4))
    b = rng_ops.video_noise(rng_ops.base_key(2), 4, (2, 2, 4))
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_determinism_across_calls():
    k = rng_ops.base_key(42)
    a = rng_ops.video_noise(k, 4, (2, 2, 4))
    b = rng_ops.video_noise(rng_ops.base_key(42), 4, (2, 2, 4))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_unit_gaussian_stats():
    k = rng_ops.base_key(7)
    x = np.asarray(rng_ops.video_noise(k, 8, (32, 32, 4)))
    assert abs(x.mean()) < 0.02
    assert abs(x.std() - 1.0) < 0.02
