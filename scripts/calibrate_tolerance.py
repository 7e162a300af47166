"""Calibrate per-regime verification tolerances from measurement.

For every verification regime (registry pin "backend:strategy") this script
measures, on the 8-device virtual CPU mesh:

  * the HONEST error distribution — a mesh/chunked StepEngine generates a
    recorded trace, a single-device engine re-executes every step, and the
    per-step max-abs error is collected across seeds (the only honest error
    source is GSPMD accumulation order / collective scheduling);
  * the ADVERSARY ladder — the ApproxMiner model (UNet weights truncated to
    k mantissa bits, a proxy for int8/fp8 shortcut compute) at k = 4, 2, 1,
    re-executed by the honest engine.

A regime's atol must sit between 2-10x the honest max and comfortably below
the cheapest adversary rung. The table lands in docs/PROTOCOL.md and the
defaults in network/validator.DEFAULT_REGIME_ATOL; the raw numbers are
written to benchmarks/data/tolerance_calibration.json.

Run: python scripts/calibrate_tolerance.py [--seeds 3] [--steps 3]
(~10 min warm cache on a 1-core host). Reference analog being beaten:
allclose(rtol=1, atol=1) — `/root/reference/InferNet/template/validator/
proof.py:419-627`.
"""

import argparse
import dataclasses
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import numpy as np  # noqa: E402


def regime_specs():
    """(name, mesh_shape, strategy_overrides, num_frames)."""
    return [
        ("fsdp", (1, 8, 1), {}, 8),
        ("cp_exact", (1, 1, 4), {}, 8),
        ("cp_ulysses", (1, 1, 4), {}, 8),
        ("chunk", (1, 1, 4), {"num_chunks": 4}, 8),
        ("hybrid", (1, 2, 4), {"num_chunks": 4}, 8),
        ("hybrid_ctx", (1, 2, 4), {"num_chunks": 4}, 8),
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", "data", "tolerance_calibration.json"))
    args = ap.parse_args()

    from dvdx_tpu.network.mock import _truncate_mantissa
    from dvdx_tpu.network.validator import DEFAULT_REGIME_ATOL
    from dvdx_tpu.parallel.mesh import make_mesh
    from dvdx_tpu.parallel.strategies import get_strategy
    from dvdx_tpu.pipelines.text2video import build_pipeline
    from dvdx_tpu.utils.testing import perturb_zero_params
    from dvdx_tpu.verify.spotcheck import StepEngine, verify_revealed_steps

    pipe = build_pipeline("zeroscope-tiny", seed=0)
    pipe.params = perturb_zero_params(pipe.params, seed=99)
    H = W = 32
    T = args.steps

    def verify_errs(gen_engine, ver_engine, seed, F):
        ctx = (ver_engine.context_latent(seed, F, H, W)
               if ver_engine.chunked else None)
        _v, zs, epss, ts = gen_engine.generate_recorded(
            "calibration", seed=seed, num_frames=F, height=H, width=W,
            num_steps=T, guidance_scale=7.5)
        leaves = {i: (int(ts[i]), zs[i], epss[i]) for i in range(T)}
        res, _ = verify_revealed_steps(
            ver_engine, "calibration", "", leaves, list(range(T)), T, 7.5,
            same_platform=False, atol=float("inf"), ctx=ctx)
        return [max(r.max_eps_err, r.max_z_err) for r in res.values()]

    out = {"backend": jax.default_backend(), "steps": T,
           "seeds": args.seeds, "regimes": {}, "adversary": {}}

    for name, mesh_shape, over, F in regime_specs():
        strat = get_strategy(name, **over)
        n_dev = int(np.prod(mesh_shape))
        mesh = make_mesh(mesh_shape, devices=jax.devices()[:n_dev])
        gen = StepEngine(pipe, mesh=mesh, strategy=strat)
        ver = StepEngine(pipe, strategy=strat) if strat.chunked \
            else StepEngine(pipe)
        errs = []
        for seed in range(args.seeds):
            errs += verify_errs(gen, ver, seed, F)
        out["regimes"][name] = {
            "mesh": list(mesh_shape),
            "honest_max": float(np.max(errs)),
            "honest_mean": float(np.mean(errs)),
            "bound": DEFAULT_REGIME_ATOL.get(name),
            "margin_x": round(DEFAULT_REGIME_ATOL.get(name, 0)
                              / max(float(np.max(errs)), 1e-12), 2),
        }
        print(f"{name:12s} mesh={mesh_shape} honest max={np.max(errs):.2e} "
              f"mean={np.mean(errs):.2e} bound={DEFAULT_REGIME_ATOL.get(name)}")

    honest = StepEngine(pipe)
    for bits in (4, 2, 1):
        cheap_params = dict(pipe.params)
        cheap_params["unet"] = _truncate_mantissa(pipe.params["unet"], bits)
        cheap_pipe = dataclasses.replace(pipe, params=cheap_params,
                                         _gen_cache={})
        errs = []
        for seed in range(args.seeds):
            errs += verify_errs(StepEngine(cheap_pipe), honest, seed, 8)
        out["adversary"][f"keep_{bits}_mantissa_bits"] = {
            "min": float(np.min(errs)), "max": float(np.max(errs))}
        print(f"approx k={bits} bits: err in [{np.min(errs):.2e}, "
              f"{np.max(errs):.2e}]")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}")

    # separation verdict: every bound must clear honest max AND sit below
    # the cheapest adversary rung observed
    adv_floor = min(v["min"] for v in out["adversary"].values())
    bad = [n for n, r in out["regimes"].items()
           if r["bound"] is None or r["bound"] <= r["honest_max"]]
    print(f"adversary floor (cheapest rung min err): {adv_floor:.2e}")
    loose = [n for n, r in out["regimes"].items()
             if r["bound"] and r["bound"] >= adv_floor]
    if bad:
        print(f"FAIL: bounds below honest max for {bad}")
        sys.exit(1)
    if loose:
        print(f"WARN: bounds above the 4-bit adversary floor for {loose} "
              f"(caught only from the 2-bit rung up)")
    print("calibration OK")


if __name__ == "__main__":
    main()
