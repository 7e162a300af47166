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


def test_segmented_runner_matches_fused(tiny_pipeline):
    """Segment-launched denoise must equal the fused-scan generator bitwise
    (same step program, same order) — it only changes launch granularity."""
    import jax.numpy as jnp

    from dvdx_tpu.models.text_encoder import tokenize_batch
    from dvdx_tpu.ops import rng as rng_ops
    from dvdx_tpu.pipelines.text2video import build_segmented_runner

    pipe = tiny_pipeline
    run = build_segmented_runner(pipe, num_frames=2, height=32, width=32,
                                 num_steps=5, guidance_scale=7.5,
                                 segment_steps=2)
    ids = jnp.asarray(tokenize_batch(["", "segments"], pipe.spec.text.vocab_size,
                                     pipe.spec.text.max_length))
    key = rng_ops.base_key(3)
    frames_seg = np.asarray(run(pipe.params, ids, key))

    fn, _ = pipe.generator(2, 32, 32, 5, 7.5, 0.0, False)
    frames_fused = np.asarray(fn(pipe.params, ids, key))
    np.testing.assert_allclose(frames_seg, frames_fused, atol=1e-5)


def test_cfg_split_matches_batched(tiny_pipeline):
    """Sequential-CFG must match the batched-CFG program numerically (same
    math, different batching)."""
    a = generate(tiny_pipeline, "split check", seed=6, num_frames=2, height=32,
                 width=32, num_steps=2, cfg_split=False)
    b = generate(tiny_pipeline, "split check", seed=6, num_frames=2, height=32,
                 width=32, num_steps=2, cfg_split=True)
    np.testing.assert_allclose(a.astype(np.float32), b.astype(np.float32),
                               atol=2.0)  # uint8 scale; f32 reorder noise only
    assert np.mean(np.abs(a.astype(np.float32) - b.astype(np.float32))) < 0.2
