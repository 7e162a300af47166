"""Real-LPIPS ingestion parity (the MD-VQS video-quality term; the reference
uses lpips(net='alex'), scoring.py:269-309)."""

import numpy as np
import pytest
import torch

from dvdx_tpu.scoring.lpips import LPIPS
from dvdx_tpu.utils.convert import convert_lpips


@pytest.fixture(scope="module")
def lpips_pair():
    from tests.torch_ref import LPIPSRef

    ref = LPIPSRef().eval()
    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if "lin" in name:
                p.copy_(torch.rand(p.shape, generator=g) * 0.2)  # non-negative
            else:
                p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    sd = {k: v.detach().float().numpy() for k, v in ref.state_dict().items()}
    ours = LPIPS(params=convert_lpips(sd))
    return ref, ours


def test_lpips_distance_parity(lpips_pair):
    ref, ours = lpips_pair
    rng = np.random.default_rng(0)
    a = rng.uniform(-1, 1, (3, 64, 64, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (3, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(a.transpose(0, 3, 1, 2)),
                   torch.from_numpy(b.transpose(0, 3, 1, 2))).numpy()
    got = ours.distance(a, b)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)
    # identical inputs -> exactly zero
    np.testing.assert_allclose(ours.distance(a, a), 0.0, atol=1e-7)


def test_lpips_consecutive_u8_matches_f32_path(lpips_pair):
    """consecutive_mean_u8 (one uint8 transfer, one feature pass per frame)
    is the same metric as the pairwise f32 path — the on-device u8->[-1,1]
    conversion is the identical IEEE op and the taps diff to the same pairs."""
    _, ours = lpips_pair
    frames_u8 = np.random.default_rng(11).integers(
        0, 255, (5, 64, 64, 3), dtype=np.uint8)
    frames_f32 = frames_u8.astype(np.float32) / 127.5 - 1.0
    want = ours.consecutive_mean(frames_f32)
    got = ours.consecutive_mean_u8(frames_u8)
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-5)
    assert ours.consecutive_mean_u8(frames_u8[:1]) == 0.0


def test_lpips_converter_is_strict(lpips_pair):
    ref, _ = lpips_pair
    sd = {k: v.detach().float().numpy() for k, v in ref.state_dict().items()}
    sd["bogus.weight"] = np.zeros((1,), np.float32)
    with pytest.raises(ValueError, match="unconverted"):
        convert_lpips(sd)


def test_mdvqs_uses_real_lpips(lpips_pair):
    from dvdx_tpu.scoring.clip_score import CLIPScorer
    from dvdx_tpu.scoring.mdvqs import MDVQS

    _, ours = lpips_pair
    mdvqs = MDVQS(CLIPScorer.build(), lpips_metric=ours)
    frames = np.random.default_rng(3).integers(
        0, 255, (4, 64, 64, 3), dtype=np.uint8)
    out = mdvqs.score(frames, "a test video")
    assert 0.0 <= out["score"] <= 1.0
    assert out["perceptual_metric"] == "lpips-alex"
    # a static video has zero perceptual distance -> VQ = 1 (before the
    # authenticity gate zeroes the total)
    static = np.repeat(frames[:1], 4, axis=0)
    out2 = mdvqs.score(static, "a test video")
    assert out2["perceptual_distance"] < 1e-6
    assert out2["score"] == 0.0            # authenticity gate: static video
