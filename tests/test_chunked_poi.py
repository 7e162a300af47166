"""Chunked-strategy miners are verifiable (VERDICT r4 item 1).

The reference's HEADLINE distribution mode is fsdp + temporal chunking with
coherent blending (`/root/reference/Distribution/strategies/
fsdp_chunked_coherent.py`), but its verification pillar never composed with
it. Here the chunk plan is deterministic given (num_frames, num_chunks,
preset overlap), the miner commits num_chunks in its response, and the
validator re-executes the committed plan's program — leaves are the
chunk-stacked (n, L, lh, lw, C) latents, the base-noise binding gathers the
seed-derived noise through the same plan, and the video binding ramp-blends
the final chunk stack before decoding.
"""

import asyncio

import jax
import numpy as np
import pytest

from dvdx_tpu.network.mock import build_mock_network
from dvdx_tpu.network.validator import ValidatorConfig
from dvdx_tpu.parallel.mesh import make_mesh
from dvdx_tpu.parallel.strategies import get_strategy
from dvdx_tpu.verify.spotcheck import StepEngine, verify_revealed_steps


def _run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


def _cfg(**kw):
    base = dict(sample_size=1, num_checkpoints=2, num_frames=8,
                width=32, height=32, num_steps=3)
    base.update(kw)
    return ValidatorConfig(**base)


F, H, W, T = 8, 32, 32, 3


def test_single_device_chunked_trace_is_bitwise(tiny_pipeline_module):
    """Prover and verifier share ONE chunked step program, so on the same
    backend the re-execution is bitwise — the same program-identity property
    the canonical path has."""
    strat = get_strategy("hybrid_ctx", num_chunks=3)
    eng = StepEngine(tiny_pipeline_module, strategy=strat)
    assert eng.platform_tag == f"{jax.default_backend()}:hybrid_ctx"
    video, zs, epss, ts = eng.generate_recorded(
        "chunk trace", seed=7, num_frames=F, height=H, width=W,
        num_steps=T, guidance_scale=7.5)
    plan = eng.chunk_plan(F)
    assert video.shape == (F, H, W, 3)
    assert zs.shape == (T, plan.num_chunks, plan.chunk_len, 16, 16, 4)

    ver = StepEngine(tiny_pipeline_module,
                     strategy=get_strategy("hybrid_ctx", num_chunks=3))
    ctx = ver.context_latent(7, F, H, W)
    leaves = {i: (int(ts[i]), zs[i], epss[i]) for i in range(T)}
    results, _ = verify_revealed_steps(
        ver, "chunk trace", "", leaves, [0, 1, 2], T, 7.5,
        same_platform=True, atol=0.0, ctx=ctx)
    assert all(r.passed and r.bitwise for r in results.values()), results
    # base-noise binding: gathered chunks of the seed-derived noise, bitwise
    base = ver.base_latent(7, F, H, W)
    assert zs[0].tobytes() == base.tobytes()
    # video binding: blend final chunk stack -> decode -> compare
    ok, err = ver.verify_video_binding(
        video, leaves[T - 1], T - 1, T,
        7.5, "chunk trace", frame_indices=[0, F - 1], num_frames=F)
    assert ok, err


def test_mesh_chunked_trace_verifies_single_device(tiny_pipeline_module):
    """A hybrid_ctx miner sharded over a (1,2,4) mesh (fsdp params + 4-way
    chunk sharding) emits a trace the 1-device validator re-executes within
    the calibrated chunked-regime tolerance."""
    mesh = make_mesh((1, 2, 4))
    eng = StepEngine(tiny_pipeline_module, mesh=mesh,
                     strategy=get_strategy("hybrid_ctx", num_chunks=4))
    _v, zs, epss, ts = eng.generate_recorded(
        "mesh chunk", seed=3, num_frames=F, height=H, width=W,
        num_steps=T, guidance_scale=7.5)
    ver = StepEngine(tiny_pipeline_module,
                     strategy=get_strategy("hybrid_ctx", num_chunks=4))
    ctx = ver.context_latent(3, F, H, W)
    leaves = {i: (int(ts[i]), zs[i], epss[i]) for i in range(T)}
    results, _ = verify_revealed_steps(
        ver, "mesh chunk", "", leaves, [0, 1, 2], T, 7.5,
        same_platform=False, atol=1e-1, ctx=ctx)
    assert all(r.passed for r in results.values()), results
    worst = max(max(r.max_eps_err, r.max_z_err) for r in results.values())
    assert worst < 5e-2, worst  # measured ~3e-2; headroom to the 1e-1 bound


def test_chunked_miner_full_round(tiny_pipeline_module):
    """End-to-end: a hybrid_ctx mesh miner registers with its strategy pin,
    the validator rebuilds the committed chunk plan from resp.num_chunks and
    verifies the full cascade green."""
    net = build_mock_network(n_miners=1, pipeline=tiny_pipeline_module,
                             validator_config=_cfg(),
                             mesh=make_mesh((1, 2, 4)),
                             mesh_strategy="hybrid_ctx")
    info = net.registry.by_pubkey(net.miners[0].pubkey)
    assert info.platform == f"{jax.default_backend()}:hybrid_ctx"
    report = _run(net.run_request("chunk-req-1", "a chunked teal orb"))
    d = next(iter(report["miners"].values()))
    assert d["checks"].get("base_noise"), d
    assert d["checks"].get("reexecution"), d
    assert d["checks"].get("video_binding"), d
    assert d["verify_engine"] == "hybrid_ctx"
    assert d["regime_atol"] == pytest.approx(1e-1)
    assert d["score"] > 0.0 and not d.get("cheat", False)
    assert net.ledger.requests["chunk-req-1"].status == "distributed"


def test_lazy_chunked_miner_detected(tiny_pipeline_module):
    """Falsifiability in the chunked regime: fabricated eps leaves are O(1)
    off — far beyond the 1e-1 chunked tolerance."""
    net = build_mock_network(n_miners=1, adversaries=["lazy"],
                             pipeline=tiny_pipeline_module,
                             validator_config=_cfg(num_checkpoints=3),
                             mesh=make_mesh((1, 2, 4)),
                             mesh_strategy="hybrid_ctx")
    report = _run(net.run_request("chunk-req-2", "a cheating chunk miner"))
    d = next(iter(report["miners"].values()))
    assert d.get("cheat", False) is True, d
    assert d["score"] == 0.0


def test_num_chunks_lie_fails_shape_crosscheck(tiny_pipeline_module):
    """A miner lying about num_chunks changes the plan-derived leaf shape;
    the validator's latent_shape cross-check refuses before any compute."""
    net = build_mock_network(n_miners=1, pipeline=tiny_pipeline_module,
                             validator_config=_cfg(),
                             mesh=make_mesh((1, 2, 4)),
                             mesh_strategy="hybrid_ctx")
    miner = net.miners[0]
    orig = miner._generate_with_proof

    def tampered(req):
        resp = orig(req)
        resp.num_chunks = resp.num_chunks + 1
        return resp

    miner._generate_with_proof = tampered
    report = _run(net.run_request("chunk-req-3", "a shape-lying miner"))
    d = next(iter(report["miners"].values()))
    assert d.get("failed_check") == "latent_shape", d
    assert d["score"] == 0.0


def test_chunked_pin_with_canonical_trace_fails(tiny_pipeline_module):
    """A miner pinned backend:chunk that actually ran the canonical
    (unchunked) program cannot pass: its leaves have the wrong shape for
    every committed plan."""
    net = build_mock_network(n_miners=1, pipeline=tiny_pipeline_module,
                             validator_config=_cfg())
    # forge the registration pin to a chunked regime on an honest canonical
    # miner (the attack: select the looser chunked tolerance while running
    # the cheaper canonical program); the response's claimed platform tracks
    # the pin (it is miner-controlled and unsigned) but the trace carries
    # num_chunks=0 and full-latent leaves -> chunk_plan refusal
    info = net.registry.by_pubkey(net.miners[0].pubkey)
    info.platform = f"{jax.default_backend()}:chunk"
    miner = net.miners[0]
    orig = miner._generate_with_proof

    def claimed(req):
        resp = orig(req)
        resp.platform = info.platform
        return resp

    miner._generate_with_proof = claimed
    report = _run(net.run_request("chunk-req-4", "a mispinned miner"))
    d = next(iter(report["miners"].values()))
    assert d.get("failed_check") in ("chunk_plan", "latent_shape"), d
    assert d["score"] == 0.0


def test_precond_engine_refused(tiny_pipeline_module):
    with pytest.raises(ValueError, match="precond"):
        StepEngine(tiny_pipeline_module, strategy="precond")
