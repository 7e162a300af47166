"""A/B flash-attention variants at the XL spatial-attention shape.

The XL step profile (docs/PERF_NOTES.md round-2 addendum) shows level-0
spatial self-attention (S = 72*128 = 9216, D = 64, BH = 24 frames x 5 heads)
is ~35% of the 2.35 s XL step, with the blocked pallas kernel at ~32 TFLOPS
(~16% of v5e bf16 peak). This script times variants back-to-back with varying
inputs + forced host fetch (axon timing gotchas — CLAUDE.md).

  python -u benchmarks/attn_xl_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from dvdx_tpu.ops.attention import _xla_attention
from dvdx_tpu.ops.pallas import flash_attention as fa

import argparse

_ap = argparse.ArgumentParser()
_ap.add_argument("--shape", default="24,9216,5,64",
                 help="B,S,H,D (default: XL level-0 spatial; std geometry "
                      "CFG-batched is 32,2880,5,64)")
_ap.add_argument("--blocks", default="",
                 help="comma list of bqxbk pairs to sweep (e.g. "
                      "1152x1152,1536x1536) — overrides the default grid")
_ap.add_argument("--skip-base", action="store_true",
                 help="skip the auto/xla baselines (sweep only)")
_ns = _ap.parse_args()
B, S, H, D = (int(x) for x in _ns.shape.split(","))
FLOPS = 4 * B * H * S * S * D


def bench(name, fn, n=6):
    try:
        return _bench(name, fn, n)
    except Exception as e:
        print(f"{name:28s} FAILED: {str(e)[:120]}", flush=True)
        return None


def _bench(name, fn, n=6):
    key = jax.random.key(0)
    qs, ks, vs = [], [], []
    for i in range(n):
        k1, k2, k3, key = jax.random.split(jax.random.fold_in(key, i), 4)
        qs.append(jax.random.normal(k1, (B, S, H, D), jnp.bfloat16))
        ks.append(jax.random.normal(k2, (B, S, H, D), jnp.bfloat16))
        vs.append(jax.random.normal(k3, (B, S, H, D), jnp.bfloat16))
    f = jax.jit(fn)
    o = f(qs[0], ks[0], vs[0])
    jax.block_until_ready(o)
    float(jnp.sum(o[::7, ::13]))  # force real fetch
    t0 = time.time()
    outs = [f(qs[i], ks[i], vs[i]) for i in range(n)]
    jax.block_until_ready(outs)
    s = sum(float(jnp.sum(o[::7, ::113, ::3])) for o in outs)
    dt = (time.time() - t0) / n
    print(f"{name:28s} {dt*1e3:8.2f} ms  {FLOPS/dt/1e12:6.1f} TFLOPS  (chk {s:.1f})",
          flush=True)
    return dt


def main():
    scale = D ** -0.5
    if not _ns.skip_base:
        bench("auto (model default)",
              lambda q, k, v: fa.flash_attention(q, k, v, scale=scale))
        bench("xla", lambda q, k, v: _xla_attention(q, k, v, scale))
    blocks = ((512, 512), (1024, 512), (1024, 1024), (2048, 1024))
    if _ns.blocks:
        blocks = tuple(tuple(int(v) for v in pair.split("x"))
                       for pair in _ns.blocks.split(","))
    for bq, bk in blocks:
        bench(f"blocked bq={bq} bk={bk}",
              lambda q, k, v, bq=bq, bk=bk: fa.flash_attention(
                  q, k, v, scale=scale, block_q=bq, block_k=bk))
    # one-pass with full K/V resident, small q block (logits block_q x S f32)
    for bq in (128, 256):
        bench(f"onepass bq={bq}",
              lambda q, k, v, bq=bq: fa.flash_attention(
                  q, k, v, scale=scale, block_q=bq, onepass=True))


if __name__ == "__main__":
    main()
