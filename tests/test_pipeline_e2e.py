"""End-to-end tiny pipeline: text -> video, determinism, PoI recording."""

import numpy as np

from dvdx_tpu.pipelines.text2video import generate


def test_generate_tiny_video(tiny_pipeline):
    video = generate(tiny_pipeline, "a red ball bouncing", seed=7,
                     num_frames=4, height=32, width=32, num_steps=3)
    assert video.shape == (4, 32, 32, 3)
    assert video.dtype == np.uint8


def test_generate_deterministic(tiny_pipeline):
    a = generate(tiny_pipeline, "ocean waves", seed=11, num_frames=2,
                 height=32, width=32, num_steps=2)
    b = generate(tiny_pipeline, "ocean waves", seed=11, num_frames=2,
                 height=32, width=32, num_steps=2)
    np.testing.assert_array_equal(a, b)


def test_generate_seed_changes_output(tiny_pipeline):
    a = generate(tiny_pipeline, "ocean waves", seed=1, num_frames=2,
                 height=32, width=32, num_steps=2)
    b = generate(tiny_pipeline, "ocean waves", seed=2, num_frames=2,
                 height=32, width=32, num_steps=2)
    assert not np.array_equal(a, b)


def test_generate_with_recording(tiny_pipeline):
    video, (zs, epss, ts) = generate(
        tiny_pipeline, "a dog", seed=3, num_frames=2, height=32, width=32,
        num_steps=3, record=True)
    # one (z, eps) pair per step, latent geometry 32/4? -> downscale from config
    ds = tiny_pipeline.spec.vae.downscale
    assert zs.shape == (3, 1, 2, 32 // ds, 32 // ds, 4)
    assert epss.shape == zs.shape
    assert ts.shape == (3,)
    assert np.all(np.isfinite(zs))


def test_cci_context_changes_output(tiny_pipeline):
    a = generate(tiny_pipeline, "city", seed=5, num_frames=2, height=32,
                 width=32, num_steps=2, context_weight=0.0)
    b = generate(tiny_pipeline, "city", seed=5, num_frames=2, height=32,
                 width=32, num_steps=2, context_weight=0.35)
    assert not np.array_equal(a, b)
