"""Economics pillar: detection math, EV sweep properties, deposit bounds."""

import numpy as np
import pytest

from dvdx_tpu.economics.cost import d_min_grid, summarize
from dvdx_tpu.economics.params import DEFAULT, EconParams
from dvdx_tpu.economics.security import (
    default_grid,
    kappa_clip,
    p_detect,
    secure_region,
    simulate_ev,
)


def test_p_detect_hypergeometric_golden():
    # closed form: T=30, m=1, k=9 -> 1 - C(29,9)/C(30,9) = 1 - 21/30 = 0.3
    assert abs(p_detect(30, 1, 9) - 0.3) < 1e-9
    # all steps tampered -> certain detection (any audit)
    assert p_detect(30, 30, 1) == 1.0
    # no audit -> never detected
    assert p_detect(30, 5, 0) == 0.0
    # monotone in both m and k
    ms = p_detect(30, np.arange(1, 31), 5)
    assert np.all(np.diff(ms) >= -1e-12)
    ks = p_detect(30, 5, np.arange(0, 31))
    assert np.all(np.diff(ks) >= -1e-12)


def test_kappa_clip_limits_and_normalises():
    w = kappa_clip(np.array([[0.9, 0.05, 0.05]]), limit=0.5)
    assert abs(w.sum() - 1.0) < 1e-9
    assert w.max() <= 0.5 + 1e-9


@pytest.fixture(scope="module")
def sweep():
    g, a, f = default_grid()
    return simulate_ev(DEFAULT, gamma=g, alpha=a, f=f, n_paths=64, seed=0)


def test_reference_operating_point_is_secure(sweep):
    """alpha*=0.30, f*=0.10, gamma=0.8 must have EV_cheat < EV_honest —
    the reference's headline economic result (README.md:18, config.py:64-68)."""
    g, a, f = sweep["gamma"], sweep["alpha"], sweep["f"]
    gi = int(np.argmin(np.abs(g - 0.8)))
    ai = int(np.argmin(np.abs(a - 0.30)))
    fi = int(np.argmin(np.abs(f - 0.10)))
    assert sweep["delta"][gi, ai, fi] < 0


def test_zero_audit_zero_slash_favours_cheating(sweep):
    """With no slashing and minimal audits, skipping compute must pay."""
    # gamma is the fraction of trust REMOVED on catch (reference
    # `W[:,caught] *= (1-gamma)`): no decay is gamma = 0
    gi = int(np.argmin(np.abs(sweep["gamma"] - 0.0)))
    ai = 0   # lowest audit rate in grid (0.1)
    fi = 0   # zero slash
    assert sweep["delta"][gi, ai, fi] > 0


def test_delta_monotone_in_audit_and_slash(sweep):
    """More audits / bigger slash should never make cheating MORE attractive
    (on average over the grid)."""
    d = sweep["delta"]
    assert d[:, -1, :].mean() <= d[:, 0, :].mean()
    assert d[:, :, -1].mean() <= d[:, :, 0].mean()


def test_dmin_bounds(sweep):
    out = d_min_grid(DEFAULT, res=sweep)
    s = summarize(out)
    assert 0 < s["secure_fraction"] <= 1.0
    assert np.isfinite(s["min_d_usd"])
    # insecure cells are excluded (inf)
    assert np.isinf(out["d_min_usd"][~out["secure"]]).all()
    # deposits cover at least the miner's honest compute
    honest_cost_tao = DEFAULT.num_steps * DEFAULT.tao_per_step
    finite = np.isfinite(out["d_min_tao"])
    assert (out["d_min_tao"][finite] >= honest_cost_tao).all()


def test_sweep_deterministic():
    g = np.array([0.8])
    a = np.array([0.3])
    f = np.array([0.1])
    r1 = simulate_ev(DEFAULT, gamma=g, alpha=a, f=f, n_paths=32, seed=7)
    r2 = simulate_ev(DEFAULT, gamma=g, alpha=a, f=f, n_paths=32, seed=7)
    np.testing.assert_array_equal(r1["ev_cheat"], r2["ev_cheat"])


def test_cheapest_secure_point(sweep):
    from dvdx_tpu.economics.optimize import cheapest_secure_point

    out = cheapest_secure_point(res=sweep, gamma=0.8)
    assert out["feasible"]
    assert out["delta_ev"] < 0
    assert 0.1 <= out["alpha"] <= 0.6
    # infeasible when demanding an absurd safety margin
    out2 = cheapest_secure_point(res=sweep, gamma=0.8, margin=1e9)
    assert not out2["feasible"]


def test_logging_setup(tmp_path):
    from dvdx_tpu.utils.logging import EVENT_LEVEL, event, setup_logging

    lg = setup_logging("miner", 3, log_dir=str(tmp_path))
    lg.info("hello")
    event(lg, "proto event %d", 7)
    import logging
    assert logging.getLevelName(EVENT_LEVEL) == "EVENT"
    files = list(tmp_path.iterdir())
    assert files and files[0].read_text().count("miner3") >= 2


def test_validator_config_from_economics():
    """Closed loop economics -> protocol knobs (the reference hand-copies its
    simulated alpha*/f*/gamma into InferNet/config.py:64-79)."""
    from dvdx_tpu.network.validator import ValidatorConfig

    cfg = ValidatorConfig.from_economics(gamma=0.8, num_steps=8)
    assert 0.0 < cfg.audit_rate <= 1.0
    assert 0.0 < cfg.slash_fraction <= 0.6
    assert cfg.trust_decay == 0.8
    assert cfg.num_steps == 8            # overrides pass through
    # gamma=1.0 (no trust memory) needs more audit/slash; still feasible or
    # raises with a clear message
    try:
        cfg2 = ValidatorConfig.from_economics(gamma=1.0)
        assert cfg2.audit_rate >= cfg.audit_rate
    except ValueError as e:
        assert "secure" in str(e)


def test_min_checkpoints_secure_meets_verify_budget():
    """k is bought down to the re-execution budget while the secure region
    survives: at T=25 a 10% budget forces k<=2, and the chosen point still
    has EV_cheat < EV_honest (VERDICT r2 item 8 — the 12.2% overhead at
    T=25 was the k=3/T bound, not an engineering cost)."""
    from dvdx_tpu.economics.optimize import min_checkpoints_secure

    pt = min_checkpoints_secure(gamma=0.8, t_steps=25, budget_fraction=0.10,
                                n_paths=96, seed=0)
    assert pt["feasible"], pt
    assert pt["k"] == 2                      # floor(0.10 * 25) = 2
    assert pt["verify_fraction"] <= 0.10
    assert pt["delta_ev"] < 0                # cheating still loses


def test_from_economics_verify_budget_picks_k():
    from dvdx_tpu.network.validator import ValidatorConfig

    cfg = ValidatorConfig.from_economics(gamma=0.8, num_steps=25,
                                         verify_budget_fraction=0.10)
    assert cfg.num_checkpoints == 2
    assert cfg.num_steps == 25
    assert 0.0 < cfg.audit_rate <= 1.0 and 0.0 < cfg.slash_fraction <= 0.6
