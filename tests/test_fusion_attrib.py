"""Unit tests for the HLO-join attribution tool (benchmarks/fusion_attrib.py).

The TPU profile names hot ops only as `fusion.944`-style trace events; the
tool joins them with the compiled module's optimized HLO to get shapes and a
traffic lower bound. These tests pin the HLO text parsing against a real
compiled module (CPU) and hand-written instruction lines.
"""

import jax
import jax.numpy as jnp

from benchmarks.fusion_attrib import parse_hlo, shape_bytes, traffic_bytes


def test_shape_bytes_arrays_and_tuples():
    assert shape_bytes("bf16[48,128,72,320]{3,2,1,0:T(8,128)(2,1)}") == \
        48 * 128 * 72 * 320 * 2
    assert shape_bytes("f32[16]{0}") == 64
    assert shape_bytes("(bf16[2,4]{1,0}, f32[8]{0})") == 16 + 32
    assert shape_bytes("pred[]") == 1  # scalar: empty dims -> 1 element


def test_parse_hlo_instruction_lines():
    hlo = """
HloModule jit_step, entry_computation_layout={...}

%fused_computation.1 (param_0: bf16[64,128]) -> bf16[64,128] {
  %param_0 = bf16[64,128]{1,0} parameter(0)
  ROOT %m = bf16[64,128]{1,0} multiply(%param_0, %param_0)
}

ENTRY %main {
  %p0 = bf16[64,128]{1,0} parameter(0)
  %fusion.9 = bf16[64,128]{1,0} fusion(%p0), kind=kLoop, calls=%fused_computation.1
  ROOT %add.3 = bf16[64,128]{1,0} add(%fusion.9, %p0)
}
"""
    t = parse_hlo(hlo)
    assert t["fusion.9"]["op"] == "fusion"
    assert t["fusion.9"]["bytes"] == 64 * 128 * 2
    assert t["fusion.9"]["operands"] == ["p0"]
    # traffic = unique operands + output
    assert traffic_bytes("fusion.9", t) == 2 * 64 * 128 * 2
    # duplicate operand counted once; ROOT prefix stripped
    assert traffic_bytes("add.3", t) == 3 * 64 * 128 * 2
    assert t["m"]["op"] == "multiply"


def test_fused_computation_flops_and_body():
    hlo = """
HloModule m

%fused_computation.7 (p0: bf16[32,40,72,320], p1: bf16[3,3,320,320]) -> f32[32,40,72,320] {
  %p0 = bf16[32,40,72,320]{3,2,1,0} parameter(0)
  %p1 = bf16[3,3,320,320]{3,2,1,0} parameter(1)
  %c = f32[32,40,72,320]{3,2,1,0} convolution(%p0, %p1), window={size=3x3 pad=1_1x1_1}, dim_labels=b01f_01io->b01f
  ROOT %r = f32[32,40,72,320]{3,2,1,0} reduce(%c, %c), dimensions={3}
}

ENTRY %main {
  %x = bf16[32,40,72,320]{1,0} parameter(0)
  %w = bf16[3,3,320,320]{1,0} parameter(1)
  ROOT %convert_reduce_fusion.9 = f32[32,40,72,320]{3,2,1,0} fusion(%x, %w), kind=kOutput, calls=%fused_computation.7
}
"""
    t = parse_hlo(hlo)
    comps = t["__computations__"]
    assert t["convert_reduce_fusion.9"]["calls"] == "fused_computation.7"
    body = comps["fused_computation.7"]
    assert {"convolution", "reduce"} <= body["ops"]
    # out_elems * window(9) * cin(320) * 2
    assert body["flops"] == 32 * 40 * 72 * 320 * 9 * 320 * 2


def test_dot_flops_line():
    hlo = """
ENTRY %main {
  %a = bf16[512,320]{1,0} parameter(0)
  %b = bf16[320,1280]{1,0} parameter(1)
  ROOT %dot.3 = f32[512,1280]{1,0} dot(%a, %b), lhs_contracting_dims={1}, rhs_contracting_dims={0}
}
"""
    t = parse_hlo(hlo)
    assert t["dot.3"]["flops"] == 2 * 512 * 1280 * 320


def test_parse_real_compiled_module():
    f = jax.jit(lambda x, y: jnp.sin(x) * y + x.sum())
    x = jnp.ones((64, 128), jnp.bfloat16)
    hlo = f.lower(x, x).compile().as_text()
    t = parse_hlo(hlo)
    assert len(t) > 3
    # every parsed instruction resolves a finite traffic estimate
    for name, info in t.items():
        if name == "__computations__":
            continue
        assert traffic_bytes(name, t) >= info["bytes"]
