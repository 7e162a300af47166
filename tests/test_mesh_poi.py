"""PoI composed with the mesh strategies (VERDICT r3 item 1).

A miner generating SHARDED over a multi-device mesh (fsdp param sharding or
cp_exact frame sharding with ring temporal attention) emits a leaf trace that
a SINGLE-DEVICE validator verifies end-to-end — the "one coherent framework"
promise of SURVEY §7. The reference never composed its pillars: its miner is
strictly single-GPU (`/root/reference/InferNet/neurons/miner.py:83-123`).

Regime: sharded execution changes accumulation order, so the miner pins
platform="cpu:fsdp" (etc.) at registration and the validator's existing pin
logic verifies in tolerance mode — and must STILL catch a lazy cheat there
(falsifiability of the tolerance regime).
"""

import asyncio

import jax
import numpy as np
import pytest

from dvdx_tpu.network.mock import build_mock_network
from dvdx_tpu.network.validator import ValidatorConfig
from dvdx_tpu.parallel.mesh import make_mesh
from dvdx_tpu.verify.spotcheck import StepEngine, verify_revealed_steps


def _run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


def _cfg(**kw):
    base = dict(sample_size=1, num_checkpoints=2, num_frames=2,
                width=32, height=32, num_steps=3)
    base.update(kw)
    return ValidatorConfig(**base)


def test_mesh_engine_trace_verifies_on_single_device(tiny_pipeline_module):
    """Unit-level composition: fsdp-mesh records re-execute green on a
    1-device engine, within a tolerance 10x tighter than the validator's."""
    mesh = make_mesh((1, 8, 1))
    eng = StepEngine(tiny_pipeline_module, mesh=mesh, strategy="fsdp")
    assert eng.platform_tag == f"{jax.default_backend()}:fsdp"
    video, zs, epss, ts = eng.generate_recorded(
        "mesh trace", seed=7, num_frames=2, height=32, width=32,
        num_steps=3, guidance_scale=7.5)
    assert video.shape == (2, 32, 32, 3) and zs.shape == (3, 2, 16, 16, 4)

    single = StepEngine(tiny_pipeline_module)
    leaves = {i: (int(ts[i]), zs[i], epss[i]) for i in range(3)}
    results, _ = verify_revealed_steps(
        single, "mesh trace", "", leaves, [0, 1, 2], 3, 7.5,
        same_platform=False, atol=5e-3)  # observed ~4e-4 (GSPMD accum order)
    assert all(r.passed for r in results.values()), results
    # the z-chain (pure scheduler recurrence on revealed leaves) and the
    # seed-derived base noise stay BITWISE even for a sharded miner
    base = single.base_latent(7, 2, 32, 32)
    assert zs[0].tobytes() == base.tobytes()


def test_mesh_engine_rejects_precond_strategy(tiny_pipeline_module):
    # chunked strategies are verifiable since round 5 (test_chunked_poi.py);
    # precond's full-latent pre-phase changes leaf shapes mid-trace and
    # stays refused
    with pytest.raises(ValueError, match="precond"):
        StepEngine(tiny_pipeline_module, mesh=make_mesh((1, 1, 8)),
                   strategy="precond")


def test_fsdp_mesh_miner_full_round(tiny_pipeline_module):
    net = build_mock_network(n_miners=1, pipeline=tiny_pipeline_module,
                             validator_config=_cfg(),
                             mesh=make_mesh((1, 8, 1)), mesh_strategy="fsdp")
    info = net.registry.by_pubkey(net.miners[0].pubkey)
    assert info.platform == f"{jax.default_backend()}:fsdp"
    report = _run(net.run_request("mesh-req-1", "a sharded blue cube"))
    assert len(report["miners"]) == 1
    d = next(iter(report["miners"].values()))
    assert d["checks"]["signature"] and d["checks"]["merkle"], d
    assert d["checks"]["reexecution"], d
    assert d["same_platform"] is False          # pin cpu:fsdp != cpu
    assert d.get("reexec_bitwise") is not True  # tolerance regime
    assert d["score"] > 0.0 and not d.get("cheat", False)
    assert net.ledger.requests["mesh-req-1"].status == "distributed"


def test_cp_exact_mesh_miner_full_round(tiny_pipeline_module):
    # frame axis sharded 2-way, ring temporal attention; 4 frames = 2/shard
    mesh = make_mesh((1, 1, 2), devices=jax.devices()[:2])
    net = build_mock_network(n_miners=1, pipeline=tiny_pipeline_module,
                             validator_config=_cfg(num_frames=4),
                             mesh=mesh, mesh_strategy="cp_exact")
    report = _run(net.run_request("mesh-req-2", "a ring-sharded sphere"))
    d = next(iter(report["miners"].values()))
    assert d["checks"]["reexecution"], d
    assert d["same_platform"] is False
    assert d["score"] > 0.0 and not d.get("cheat", False)


def test_lazy_mesh_miner_detected_in_tolerance_mode(tiny_pipeline_module):
    """The tolerance regime must still be falsifiable: a mesh miner that
    fabricates eps for the last step is caught by re-execution (fabricated
    noise is ~O(1) away — far beyond the 5e-2 atol)."""
    net = build_mock_network(n_miners=1, adversaries=["lazy"],
                             pipeline=tiny_pipeline_module,
                             validator_config=_cfg(num_checkpoints=3),
                             mesh=make_mesh((1, 8, 1)), mesh_strategy="fsdp")
    report = _run(net.run_request("mesh-req-3", "a cheating mesh miner"))
    d = next(iter(report["miners"].values()))
    assert d.get("cheat", False) is True, d
    assert d["score"] == 0.0
