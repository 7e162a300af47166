"""A/B: posmajor temporal attention (hoisted HBM transposes + packed kernel)
vs the frame-major checkerboard kernel (no relayouts at all).

Times the full sub-graph each variant implies inside TransformerTemporal:
posmajor pays swapaxes -> kernel -> swapaxes; fm runs the kernel on the
native (B, F, N, HD) layout. Same math (tests assert equality).

  python -u benchmarks/temporal_fm_ab.py --geometry xl --reps 6
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--geometry", choices=("std", "xl", "std1", "xl2"),
                    default="xl")
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dvdx_tpu.ops.pallas.temporal_attention import (
        temporal_attention_fm, temporal_attention_posmajor)

    # (B, F, N, HD, heads) — in-model temporal attention shapes
    geoms = {
        "std": (2, 16, 2880, 320, 5),    # level-0, standard
        "std1": (2, 16, 720, 640, 10),   # level-1, standard
        "xl": (1, 24, 9216, 320, 5),     # level-0, XL cfg_split
        "xl2": (1, 24, 2304, 640, 10),   # level-1, XL
    }
    b, f, n, hd, h = geoms[args.geometry]
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(b, f, n, hd)).astype(np.float32),
                           dt) for _ in range(3))

    @jax.jit
    def posmajor(q, k, v):
        qp, kp, vp = (jnp.swapaxes(t, 1, 2) for t in (q, k, v))
        o = temporal_attention_posmajor(qp, kp, vp, heads=h)
        return jnp.swapaxes(o, 1, 2)

    @jax.jit
    def fm(q, k, v):
        return temporal_attention_fm(q, k, v, heads=h)

    def force(y):
        return float(jnp.sum(y[::7].astype(jnp.float32)))

    ref = posmajor(q, k, v)
    out = fm(q, k, v)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - out.astype(jnp.float32))))

    def timed(fn):
        force(fn(q, k, v))
        t0 = time.time()
        for _ in range(args.reps):
            y = fn(q, k, v)
        force(y)
        return (time.time() - t0) / args.reps

    t_pm = timed(posmajor)
    t_fm = timed(fm)
    print(json.dumps({
        "geometry": args.geometry, "b": b, "f": f, "n": n, "hd": hd,
        "posmajor_plus_transposes_ms": round(t_pm * 1e3, 2),
        "fm_checkerboard_ms": round(t_fm * 1e3, 2),
        "speedup": round(t_pm / t_fm, 3),
        "max_abs_err": round(err, 5),
    }))


if __name__ == "__main__":
    main()
