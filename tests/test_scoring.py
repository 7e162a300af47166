"""Scoring tests: authenticity rejection, CLIP score ranges, MD-VQS, boundary
metrics — mirrors the reference's MD-VQS range tests on a synthetic video
(`/root/reference/InferNet/tests/test_validator.py:108-115,180-201`)."""

import numpy as np
import pytest

from dvdx_tpu.scoring.clip_score import CLIPScorer
from dvdx_tpu.scoring.mdvqs import (
    MDVQS,
    mean_flow_magnitude,
    verify_video_authenticity,
)
from dvdx_tpu.scoring.temporal import (
    boundary_pairs,
    flow_warp_error,
    global_temporal_instability,
    temporal_instability,
)


def synthetic_video(frames=6, size=32, seed=0):
    """Moving gradient + noise — the ffmpeg-testsrc analog."""
    rng = np.random.default_rng(seed)
    base = np.linspace(0, 255, size, dtype=np.float32)
    vid = []
    for i in range(frames):
        img = np.zeros((size, size, 3), np.float32)
        img[..., 0] = np.roll(base, i * 2)[None, :]
        img[..., 1] = base[:, None]
        img[..., 2] = 128
        img += rng.normal(0, 8, img.shape)
        vid.append(img)
    return np.clip(np.stack(vid), 0, 255).astype(np.uint8)


def test_authenticity_accepts_real_motion():
    assert verify_video_authenticity(synthetic_video())["authentic"]


def test_authenticity_rejects_static():
    static = np.full((6, 32, 32, 3), 128, np.uint8)
    assert not verify_video_authenticity(static)["authentic"]


def test_authenticity_rejects_constant_noise_free_black():
    black = np.zeros((6, 32, 32, 3), np.uint8)
    assert not verify_video_authenticity(black)["authentic"]


def test_authenticity_device_path_bit_identical():
    """The on-device integer reductions (histogram counts + |diff| sums,
    finished in f64 on host) must produce EXACTLY the host-numpy result —
    same floats, not merely close — for real, static, and 2-frame videos."""
    import jax.numpy as jnp

    for vid in (synthetic_video(), np.full((6, 32, 32, 3), 128, np.uint8),
                synthetic_video(frames=2)):
        host = verify_video_authenticity(vid)
        dev = verify_video_authenticity(jnp.asarray(vid))
        assert host == dev, (host, dev)


@pytest.fixture(scope="module")
def scorer():
    return CLIPScorer.build(seed=42)


def test_clip_score_in_range_and_deterministic(scorer):
    vid = synthetic_video()
    s1 = scorer.score_video(vid, "moving color gradient")
    s2 = scorer.score_video(vid, "moving color gradient")
    assert 0.0 <= s1 <= 1.0
    assert s1 == s2


def test_clip_score_prompt_sensitivity(scorer):
    vid = synthetic_video()
    a = scorer.score_video(vid, "moving color gradient")
    b = scorer.score_video(vid, "a portrait of a dog wearing a hat")
    assert a != b


def test_mdvqs_components(scorer):
    m = MDVQS(scorer)
    out = m.score(synthetic_video(), "moving color gradient")
    for k in ["score", "prompt_fidelity", "video_quality", "temporal_consistency"]:
        assert 0.0 <= out[k] <= 1.0, k
    assert out["authentic"]


def test_mdvqs_zero_for_static(scorer):
    m = MDVQS(scorer)
    out = m.score(np.full((4, 32, 32, 3), 99, np.uint8), "anything")
    assert out["score"] == 0.0


def test_boundary_metrics():
    vid = synthetic_video(frames=8)
    pairs = boundary_pairs([(0, 4), (4, 8)])
    assert pairs == [(3, 4)]
    ti = temporal_instability(vid, pairs)
    assert 0.0 <= ti <= 1.0
    # discontinuous video at the boundary has higher instability
    vid2 = vid.copy()
    vid2[4:] = 255 - vid2[4:]
    assert temporal_instability(vid2, pairs) > ti
    fe = flow_warp_error(vid, pairs)
    assert fe >= 0.0
    assert global_temporal_instability(vid) > 0.0


def test_flow_magnitude_moves():
    still = np.broadcast_to(synthetic_video(1)[0], (4, 32, 32, 3))
    assert mean_flow_magnitude(np.ascontiguousarray(still)) < mean_flow_magnitude(synthetic_video(6)) + 1e-6
