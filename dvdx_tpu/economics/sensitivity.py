"""Sensitivity sweeps over emission and compute-cost assumptions.

Reference: `Economics/core/e_subnet_sensitivity.py`, `sensitivity/
cost_sensitivity.py`, `sensitivity/subnet_sensitivity.py` — recompute Stage-1
security and Stage-2 deposit bounds over E_SUBNET in {.003,.005,.007,.010} and
COST_STEP in {4e-6..1e-5}.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence

import numpy as np

from .cost import d_min_grid, summarize
from .params import DEFAULT, EconParams
from .security import default_grid, simulate_ev

E_SUBNET_GRID = (0.003, 0.005, 0.007, 0.010)
COST_STEP_GRID = (4e-6, 6e-6, 8e-6, 1e-5)


def _run_point(params: EconParams, **kwargs) -> Dict[str, float]:
    gamma, alpha, f = default_grid()
    res = simulate_ev(params, gamma=gamma, alpha=alpha, f=f, **kwargs)
    cost = d_min_grid(params, res=res)
    s = summarize(cost)
    s["max_delta"] = float(res["delta"].max())
    s["min_delta"] = float(res["delta"].min())
    return s


def e_subnet_sensitivity(base: EconParams = DEFAULT,
                         grid: Sequence[float] = E_SUBNET_GRID,
                         **kwargs) -> List[Dict[str, float]]:
    out = []
    for e in grid:
        p = dataclasses.replace(base, e_subnet=e)
        row = _run_point(p, **kwargs)
        row["e_subnet"] = e
        out.append(row)
    return out


def cost_step_sensitivity(base: EconParams = DEFAULT,
                          grid: Sequence[float] = COST_STEP_GRID,
                          **kwargs) -> List[Dict[str, float]]:
    out = []
    for c in grid:
        p = dataclasses.replace(base, tao_per_step=c)
        row = _run_point(p, **kwargs)
        row["tao_per_step"] = c
        out.append(row)
    return out
