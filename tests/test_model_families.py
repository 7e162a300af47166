"""Additional model families: DiT video (CogVideoX-class) and SVD img2vid."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvdx_tpu.models.dit_video import VideoDiT, init_dit_params, tiny_dit_config
from dvdx_tpu.utils.testing import perturb_zero_params


def test_dit_shapes_and_zero_init():
    cfg = tiny_dit_config()
    model = VideoDiT(cfg)
    params = init_dit_params(cfg)
    lat = jax.random.normal(jax.random.key(0), (1, 2, 16, 16, 4))
    ts = jnp.asarray([500])
    ctx = jax.random.normal(jax.random.key(1), (1, 8, cfg.text_hidden_size))
    out = jax.jit(model.apply)(params, lat, ts, ctx)
    assert out.shape == lat.shape
    np.testing.assert_array_equal(np.asarray(out), 0.0)  # adaLN-zero + proj_out_zero


def test_dit_text_conditioning_flows():
    cfg = tiny_dit_config()
    model = VideoDiT(cfg)
    params = perturb_zero_params(init_dit_params(cfg), seed=3)
    lat = jax.random.normal(jax.random.key(0), (1, 2, 16, 16, 4))
    ts = jnp.asarray([500])
    apply = jax.jit(model.apply)
    a = apply(params, lat, ts, jax.random.normal(jax.random.key(1), (1, 8, 64)))
    b = apply(params, lat, ts, jax.random.normal(jax.random.key(2), (1, 8, 64)))
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_dit_text2video_pipeline_end_to_end():
    from dvdx_tpu.pipelines.text2video import build_pipeline, generate

    pipe = build_pipeline("dit-tiny", seed=0)
    pipe.params = perturb_zero_params(pipe.params, seed=99)
    a = generate(pipe, "a spinning galaxy", seed=4, num_frames=2, height=32,
                 width=32, num_steps=2)
    assert a.shape == (2, 32, 32, 3)
    b = generate(pipe, "a spinning galaxy", seed=4, num_frames=2, height=32,
                 width=32, num_steps=2)
    np.testing.assert_array_equal(a, b)


def test_dit_v_prediction_schedule():
    from dvdx_tpu.models.zoo import get_model_spec
    from dvdx_tpu.ops.scheduler import ddim_step, make_ddim_schedule

    assert get_model_spec("dit-tiny").prediction_type == "v_prediction"
    sched_v = make_ddim_schedule(4, prediction_type="v_prediction")
    sched_e = make_ddim_schedule(4, prediction_type="epsilon")
    z = jnp.ones((1, 1, 2, 2, 4))
    out = jnp.full_like(z, 0.1)
    a = ddim_step(sched_v, jnp.asarray(1), z, out)
    b = ddim_step(sched_e, jnp.asarray(1), z, out)
    assert not np.allclose(np.asarray(a), np.asarray(b))
    assert np.all(np.isfinite(np.asarray(a)))


def test_svd_img2vid_end_to_end():
    from dvdx_tpu.pipelines.img2video import (
        build_img2video_pipeline,
        generate_from_image,
    )

    pipe = build_img2video_pipeline("svd-tiny", seed=0)
    pipe.base.params = perturb_zero_params(pipe.base.params, seed=99)
    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    video = generate_from_image(pipe, image, seed=5, num_frames=2, num_steps=2)
    assert video.shape == (2, 32, 32, 3)
    v2 = generate_from_image(pipe, image, seed=5, num_frames=2, num_steps=2)
    np.testing.assert_array_equal(video, v2)
    # different conditioning image -> different video
    image2 = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    v3 = generate_from_image(pipe, image2, seed=5, num_frames=2, num_steps=2)
    assert not np.array_equal(video, v3)


def test_dit_strategy_mesh_compat(tiny_pipeline_module):
    """The DiT family must run under the same strategy runner (cp_exact)."""
    from dvdx_tpu.models.text_encoder import tokenize_batch
    from dvdx_tpu.ops import rng as rng_ops
    from dvdx_tpu.parallel.mesh import make_mesh
    from dvdx_tpu.parallel.strategies import build_runner, get_strategy
    from dvdx_tpu.pipelines.text2video import build_pipeline

    pipe = build_pipeline("dit-tiny", seed=0)
    pipe.params = perturb_zero_params(pipe.params, seed=99)
    mesh = make_mesh((1, 2, 4))
    runner = build_runner(pipe, get_strategy("hybrid"), mesh, num_frames=8,
                          height=32, width=32, num_steps=2)
    ids = tokenize_batch(["", "galaxy"], pipe.spec.text.vocab_size,
                         pipe.spec.text.max_length)
    frames = runner(pipe.params, jnp.asarray(ids), rng_ops.base_key(1))
    assert frames.shape == (8, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(frames)))


def test_dit_family_poi_round():
    """The verification stack is model-family-agnostic: a full PoI round
    (bitwise re-execution, base-noise + video binding) over the v-prediction
    video DiT — the denoiser is just `apply` to the shared StepEngine."""
    import asyncio

    from dvdx_tpu.network.mock import build_mock_network
    from dvdx_tpu.network.validator import ValidatorConfig
    from dvdx_tpu.pipelines.text2video import build_pipeline
    from dvdx_tpu.utils.testing import perturb_zero_params

    pipe = build_pipeline("dit-tiny", seed=0)
    pipe.params = perturb_zero_params(pipe.params, seed=99)
    cfg = ValidatorConfig(sample_size=1, num_checkpoints=2, num_frames=2,
                          width=32, height=32, num_steps=3,
                          guidance_scale=6.0)
    net = build_mock_network(n_miners=1, pipeline=pipe, validator_config=cfg)
    report = asyncio.new_event_loop().run_until_complete(
        net.run_request("dit-poi", "a drifting nebula"))
    d = report["miners"]["0"]
    assert d["checks"]["reexecution"] is True
    assert d.get("reexec_bitwise") is True
    assert d["checks"].get("base_noise") is True
    assert d["score"] > 0 and not d.get("cheat", False)
