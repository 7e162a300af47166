"""A/B: classic head-major flash attention (with its 4 HBM transposes) vs
the multi-head-NATIVE schedule (ops/pallas/flash_attention.flash_attention_mh)
that consumes the projections' (B, S, H*dp) layout directly.

Both sides run the FULL attention sub-graph (to_q/to_k/to_v projections,
attention, to_out) so the comparison includes the native path's doubled
projection width (zero-padded head strips) and the classic path's transpose
copies — the quantities that actually trade off in-model.

  python -u benchmarks/attn_mh_ab.py --geometry std --reps 6
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
    ap.add_argument("--geometry", choices=("std", "std1", "xl", "cross"),
                    default="std")
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--bq", type=int, default=0)
    ap.add_argument("--bk", type=int, default=0)
    ap.add_argument("--onepass", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dvdx_tpu.ops.attention import multi_head_attention
    from dvdx_tpu.ops.pallas.flash_attention import (flash_attention_mh,
                                                     pad_head_columns,
                                                     pad_head_rows)

    # (B, S_q, S_kv, C, heads)
    geoms = {
        "std": (32, 2880, 2880, 320, 5),     # level-0 spatial self-attn, std
        "std1": (32, 720, 720, 640, 10),     # level-1
        "xl": (24, 9216, 9216, 320, 5),      # level-0 spatial self-attn, XL
        "cross": (32, 2880, 77, 320, 5),     # level-0 cross-attn
    }
    b, s, t, c, h = geoms[args.geometry]
    d = 64
    inner = h * d
    dt = jnp.bfloat16

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, s, c)).astype(np.float32), dt)
    ctx = (x if t == s
           else jnp.asarray(rng.normal(size=(b, t, c)).astype(np.float32), dt))
    wq, wk, wv = (jnp.asarray(rng.normal(size=(c, inner), scale=c**-0.5)
                              .astype(np.float32), dt) for _ in range(3))
    wo = jnp.asarray(rng.normal(size=(inner, c), scale=inner**-0.5)
                     .astype(np.float32), dt)
    bo = jnp.zeros((c,), dt)

    @jax.jit
    def classic(x, ctx):
        q = jnp.dot(x, wq).reshape(b, s, h, d)
        k = jnp.dot(ctx, wk).reshape(b, t, h, d)
        v = jnp.dot(ctx, wv).reshape(b, t, h, d)
        o = multi_head_attention(q, k, v)       # auto: pallas/xla dispatch
        return jnp.dot(o.reshape(b, s, inner), wo) + bo

    @jax.jit
    def native(x, ctx):
        qp = jnp.dot(x, pad_head_columns(wq, h, d))
        kp = jnp.dot(ctx, pad_head_columns(wk, h, d))
        vp = jnp.dot(ctx, pad_head_columns(wv, h, d))
        o = flash_attention_mh(qp, kp, vp, heads=h, head_dim=d,
                               block_q=args.bq or None,
                               block_k=args.bk or None,
                               onepass=args.onepass or None)
        return jnp.dot(o, pad_head_rows(wo, h, d)) + bo

    def force(y):
        return float(jnp.sum(y[::7].astype(jnp.float32)))

    ref = classic(x, ctx)
    out = native(x, ctx)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - out.astype(jnp.float32))))
    scalef = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) or 1.0

    def timed(f):
        force(f(x, ctx))  # warm
        t0 = time.time()
        for _ in range(args.reps):
            y = f(x, ctx)
        force(y)
        return (time.time() - t0) / args.reps

    t_classic = timed(classic)
    t_native = timed(native)
    print(json.dumps({
        "geometry": args.geometry, "b": b, "s": s, "t": t, "heads": h,
        "classic_ms": round(t_classic * 1e3, 2),
        "native_mh_ms": round(t_native * 1e3, 2),
        "speedup": round(t_classic / t_native, 3),
        "max_abs_err": round(err, 5), "rel_err": round(err / scalef, 6),
    }))


if __name__ == "__main__":
    main()
