"""Protocol parameter optimisation.

Reference: `Economics/core/parameter_optimisation.py` — a closed-form EV grid
search for protocol parameters. Here: find the CHEAPEST secure operating
point — the (alpha, f) minimising validator audit cost subject to
EV_cheat < EV_honest for every tamper strategy, at a given trust decay gamma.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from .cost import d_min_grid
from .params import DEFAULT, EconParams
from .security import default_grid, simulate_ev


def audit_cost_per_job(params: EconParams, alpha: float) -> float:
    """Expected validator re-execution cost (TAO/job)."""
    return alpha * params.num_checkpoints * params.tao_per_step + params.gas_cost


def cheapest_secure_point(params: EconParams = DEFAULT, gamma: float = 0.8,
                          margin: float = 0.0, res: Optional[Dict] = None,
                          **sweep_kwargs) -> Dict[str, float]:
    """Minimise audit cost over the secure region at the given gamma.

    margin > 0 requires EV_cheat < EV_honest - margin (safety buffer).
    Returns the optimal (alpha, f), its audit cost, and D_min.
    """
    gammas, alphas, fs = default_grid()
    if res is None:
        res = simulate_ev(params, gamma=gammas, alpha=alphas, f=fs, **sweep_kwargs)
    gi = int(np.argmin(np.abs(res["gamma"] - gamma)))
    secure = res["delta"][gi] < -margin          # (A, F)
    if not secure.any():
        return {"feasible": False, "gamma": gamma}

    costs = np.array([audit_cost_per_job(params, a) for a in res["alpha"]])
    cost_grid = np.broadcast_to(costs[:, None], secure.shape).copy()
    cost_grid[~secure] = np.inf
    ai, _ = np.unravel_index(np.argmin(cost_grid), cost_grid.shape)
    # audit cost depends only on alpha; among secure f at the chosen alpha,
    # take the LARGEST slash fraction — maximal one-shot deterrence at equal
    # validator cost (f=0 would leave stake-slashing toothless)
    fi = int(np.max(np.nonzero(secure[ai])[0]))

    dmin = d_min_grid(params, res=res)
    return {
        "feasible": True,
        "gamma": float(gamma),
        "alpha": float(res["alpha"][ai]),
        "f": float(res["f"][fi]),
        "audit_cost_tao_per_job": float(costs[ai]),
        "delta_ev": float(res["delta"][gi, ai, fi]),
        "d_min_usd": float(dmin["d_min_usd"][gi, ai, fi]),
        "secure_fraction_at_gamma": float(secure.mean()),
    }
