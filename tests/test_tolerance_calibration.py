"""Calibrated per-regime tolerances are adversarially falsifiable
(VERDICT r4 item 2).

The blanket cross-platform atol left a 2.5-100x gap between observed honest
error and the bound; nothing probed a cheap *approximate* miner living near
the boundary. Now each same-backend strategy regime gets an atol derived
from its measured honest-error distribution (DEFAULT_REGIME_ATOL,
scripts/calibrate_tolerance.py), and the ApproxMiner adversary —
mantissa-truncated UNet weights, a proxy for int8/fp8 shortcut compute —
must land ABOVE every calibrated bound (measured ladder: keep 4 bits
-> ~6e-2, 2 bits -> ~1.7e-1, 1 bit -> ~2.8e-1 max-abs at the tiny
geometry; tolerance bounds are 1e-2 (fsdp) / 5e-2 (cp) / 1e-1 (chunked)).
"""

import asyncio

import pytest

from dvdx_tpu.network.mock import build_mock_network
from dvdx_tpu.network.validator import DEFAULT_REGIME_ATOL, ValidatorConfig
from dvdx_tpu.parallel.mesh import make_mesh


def _run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


def _cfg(**kw):
    base = dict(sample_size=1, num_checkpoints=2, num_frames=2,
                width=32, height=32, num_steps=3)
    base.update(kw)
    return ValidatorConfig(**base)


def test_regime_table_covers_every_nonprecond_strategy():
    from dvdx_tpu.parallel.strategies import PRESETS

    for name, s in PRESETS.items():
        if name in ("single", "precond"):
            continue
        assert name in DEFAULT_REGIME_ATOL, name
        assert 0 < DEFAULT_REGIME_ATOL[name] <= 1e-1


def test_approx_miner_caught_in_bitwise_regime(tiny_pipeline_module):
    """Unmeshed approx miner pins the bare backend -> bitwise regime; a
    single flipped mantissa bit fails re-execution."""
    net = build_mock_network(n_miners=1, adversaries=["approx"],
                             pipeline=tiny_pipeline_module,
                             validator_config=_cfg())
    report = _run(net.run_request("approx-1", "a low-precision shortcut"))
    d = next(iter(report["miners"].values()))
    assert d.get("cheat", False) is True, d
    assert d.get("failed_check") in ("reexecution", "base_noise"), d


def test_approx_miner_caught_in_fsdp_tolerance_regime(tiny_pipeline_module):
    """The real target: the approx miner pins a mesh regime to hide inside
    its tolerance. The calibrated fsdp bound (1e-2, honest max 3.2e-3)
    sits far below the truncation gap (~2e-1) — caught."""
    net = build_mock_network(n_miners=1, adversaries=["approx"],
                             pipeline=tiny_pipeline_module,
                             validator_config=_cfg(),
                             mesh=make_mesh((1, 8, 1)), mesh_strategy="fsdp")
    report = _run(net.run_request("approx-2", "a mesh-hiding shortcut"))
    d = next(iter(report["miners"].values()))
    assert d.get("regime_atol") == pytest.approx(DEFAULT_REGIME_ATOL["fsdp"])
    assert d.get("cheat", False) is True, d
    assert d.get("failed_check") == "reexecution", d
    # the miss distance matters: the error must clear the bound with margin,
    # not squeak past it
    assert d.get("eps_err", 0.0) > 5 * DEFAULT_REGIME_ATOL["fsdp"], d


def test_approx_miner_caught_in_chunked_regime(tiny_pipeline_module):
    """Even the loosest calibrated bound (chunked, 1e-1) catches the 2-bit
    truncation adversary."""
    net = build_mock_network(n_miners=1, adversaries=["approx"],
                             pipeline=tiny_pipeline_module,
                             validator_config=_cfg(num_frames=8),
                             mesh=make_mesh((1, 2, 4)),
                             mesh_strategy="hybrid_ctx")
    report = _run(net.run_request("approx-3", "a chunked shortcut"))
    d = next(iter(report["miners"].values()))
    assert d.get("regime_atol") == pytest.approx(
        DEFAULT_REGIME_ATOL["hybrid_ctx"])
    assert d.get("cheat", False) is True, d
    assert d.get("failed_check") == "reexecution", d
