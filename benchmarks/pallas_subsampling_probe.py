"""Decisive micro-probes for a fused conv2d-subsampling Pallas kernel.

The round-4 verdict asks for a fused stage1+stage2 subsampling kernel that
never materializes the 9.4 GB stage-1 intermediate (at b128 x 30 s).  The
chip ablation (``subsampling_ablation.py``) shows XLA's stage-2 conv already
runs at ~163 TFLOP/s *including* its HBM input read, so a fused kernel only
wins if its hand-built 9-tap matmul accumulation sustains a comparable rate
with the parity-slicing relayouts included.  These probes measure exactly
that before any integration work:

  probe 1: 9-tap matmul accumulation [M,768]@[768,768] -> fp32 acc, all
           operands VMEM-resident (the kernel's inner loop in isolation)
  probe 2: + the two sublane-misaligned slice copies per cell (the dw=2
           parity slices) and the [Tb,17,768] -> [Tb*16,768] reshape path
  probe 3: VMEM ceiling — largest scratch the compiler accepts (decides
           whether the flatten-linear weight [12288,768] can ride along)
"""

from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gigaam_tpu.profiling import device_timeit

D = 768


def probe_taps(tb: int = 64, with_copies: bool = False,
               interpret: bool = False):
    """One grid cell's stage-2 math: 9 accumulating matmuls.

    Layout mirrors the planned kernel: even/odd time-parity x freq-parity
    blocks, fp32 accumulator, bf16 output.  ``with_copies`` adds the two
    misaligned [.,1:17,:] parity-slice copies the real kernel needs.
    """
    m = tb * 16

    def kernel(ee_ref, eo_ref, oe_ref, oo_ref, w_ref, o_ref):
        acc = jnp.zeros((m, D), jnp.float32)
        ee = ee_ref[:].reshape(m, D)                      # [Tb,16,768] flat
        oe_lo = oe_ref[0:tb].reshape(m, D)
        oe_hi = oe_ref[1:tb + 1].reshape(m, D)
        if with_copies:
            eo_a = eo_ref[:, 0:16, :].reshape(m, D)       # aligned slice
            eo_b = eo_ref[:, 1:17, :].reshape(m, D)       # misaligned copy
            oo_a = oo_ref[0:tb, 0:16, :].reshape(m, D)
            oo_b = oo_ref[0:tb, 1:17, :].reshape(m, D)
            oo_c = oo_ref[1:tb + 1, 0:16, :].reshape(m, D)
            oo_d = oo_ref[1:tb + 1, 1:17, :].reshape(m, D)
            taps = [ee, eo_a, eo_b, oe_lo, oe_hi, oo_a, oo_b, oo_c, oo_d]
        else:
            # alignment-best-case: reuse aligned views for all 9 taps
            taps = [ee, ee, ee, oe_lo, oe_hi, oe_lo, oe_hi, ee, oe_lo]
        for i, lhs in enumerate(taps):
            acc += jnp.dot(lhs, w_ref[i],
                           preferred_element_type=jnp.float32)
        o_ref[:] = acc.astype(jnp.bfloat16).reshape(tb, 16, D)

    fe = 17 if with_copies else 16
    rng = np.random.default_rng(0)
    ee = jnp.asarray(rng.standard_normal((tb, 16, D)), jnp.bfloat16)
    eo = jnp.asarray(rng.standard_normal((tb, fe, D)), jnp.bfloat16)
    oe = jnp.asarray(rng.standard_normal((tb + 1, 16, D)), jnp.bfloat16)
    oo = jnp.asarray(rng.standard_normal((tb + 1, fe, D)), jnp.bfloat16)
    w = jnp.asarray(0.02 * rng.standard_normal((9, D, D)), jnp.bfloat16)

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((tb, 16, D), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )
    flops = 9 * 2 * m * D * D

    if interpret:
        out = f(ee, eo, oe, oo, w)
        return {"ok": bool(np.isfinite(np.asarray(out, np.float32)).all())}

    dt = device_timeit(lambda a, b, c, d, e: f(a, b, c, d, e),
                       [ee, eo, oe, oo, w], k=200)
    return {"us": round(dt * 1e6, 2),
            "tflops": round(flops / dt / 1e12, 1)}


def probe_im2col(tb: int = 64, fuse_linear: bool = False):
    """Build the [M, 6912] im2col patch matrix in VMEM scratch via 9
    slice-copies, then ONE matmul — trades copy bandwidth for a K=6912
    contraction that may sustain a higher MXU rate than 9 chained K=768
    accumulates.  ``fuse_linear`` rides the flatten Linear [12288,768]
    along (needs the 120MB VMEM ceiling)."""
    m = tb * 16

    def kernel(ee_ref, eo_ref, oe_ref, oo_ref, w_ref, wl_ref, o_ref,
               p_ref):
        p_ref[:, 0 * D:1 * D] = ee_ref[:].reshape(m, D)
        p_ref[:, 1 * D:2 * D] = eo_ref[:, 0:16, :].reshape(m, D)
        p_ref[:, 2 * D:3 * D] = eo_ref[:, 1:17, :].reshape(m, D)
        p_ref[:, 3 * D:4 * D] = oe_ref[0:tb].reshape(m, D)
        p_ref[:, 4 * D:5 * D] = oe_ref[1:tb + 1].reshape(m, D)
        p_ref[:, 5 * D:6 * D] = oo_ref[0:tb, 0:16, :].reshape(m, D)
        p_ref[:, 6 * D:7 * D] = oo_ref[0:tb, 1:17, :].reshape(m, D)
        p_ref[:, 7 * D:8 * D] = oo_ref[1:tb + 1, 0:16, :].reshape(m, D)
        p_ref[:, 8 * D:9 * D] = oo_ref[1:tb + 1, 1:17, :].reshape(m, D)
        s2 = jnp.dot(p_ref[:], w_ref[:],
                     preferred_element_type=jnp.float32)
        if fuse_linear:
            s2b = jax.nn.relu(s2).astype(jnp.bfloat16).reshape(tb, 16 * D)
            o_ref[:] = jnp.dot(
                s2b, wl_ref[:],
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        else:
            o_ref[:] = s2.astype(jnp.bfloat16).reshape(tb, 16, D)[:, 0, :]

    rng = np.random.default_rng(0)
    ee = jnp.asarray(rng.standard_normal((tb, 16, D)), jnp.bfloat16)
    eo = jnp.asarray(rng.standard_normal((tb, 17, D)), jnp.bfloat16)
    oe = jnp.asarray(rng.standard_normal((tb + 1, 16, D)), jnp.bfloat16)
    oo = jnp.asarray(rng.standard_normal((tb + 1, 17, D)), jnp.bfloat16)
    w = jnp.asarray(0.02 * rng.standard_normal((9 * D, D)), jnp.bfloat16)
    wl = jnp.asarray(0.02 * rng.standard_normal((16 * D, D)), jnp.bfloat16)

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((tb, D), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((m, 9 * D), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    flops = 9 * 2 * m * D * D + (fuse_linear and 2 * tb * 16 * D * D or 0)
    dt = device_timeit(lambda *a: f(*a), [ee, eo, oe, oo, w, wl], k=200)
    return {"us": round(dt * 1e6, 2),
            "tflops": round(flops / dt / 1e12, 1)}


def probe_vmem():
    """Largest single VMEM scratch the compiler accepts (MB)."""
    ok = 0
    for mb in (16, 24, 32, 48, 64, 96, 110, 120):
        n_rows = mb * 1024 * 1024 // (2 * 1024)

        def kernel(x_ref, o_ref, scratch):
            scratch[0:8] = x_ref[:]
            o_ref[:] = scratch[0:8] * 2.0

        try:
            f = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((8, 1024), jnp.bfloat16),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((n_rows, 1024), jnp.bfloat16)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=128 * 1024 * 1024),
            )
            x = jnp.ones((8, 1024), jnp.bfloat16)
            jax.block_until_ready(jax.jit(f)(x))
            float(jax.jit(f)(x).astype(jnp.float32).sum())
            ok = mb
        except Exception as e:  # noqa: BLE001
            return {"max_scratch_mb": ok,
                    "fail_at_mb": mb, "err": str(e)[:120]}
    return {"max_scratch_mb": ok}


def main():
    res = {}
    for tb in (32, 64, 128):
        res[f"taps_tb{tb}_aligned"] = probe_taps(tb, with_copies=False)
        print(f"taps tb={tb} aligned:", res[f"taps_tb{tb}_aligned"],
              flush=True)
        res[f"taps_tb{tb}_with_copies"] = probe_taps(tb, with_copies=True)
        print(f"taps tb={tb} with_copies:",
              res[f"taps_tb{tb}_with_copies"], flush=True)
    for tb in (64, 128):
        res[f"im2col_tb{tb}"] = probe_im2col(tb)
        print(f"im2col tb={tb}:", res[f"im2col_tb{tb}"], flush=True)
        res[f"im2col_lin_tb{tb}"] = probe_im2col(tb, fuse_linear=True)
        print(f"im2col+lin tb={tb}:", res[f"im2col_lin_tb{tb}"], flush=True)
    res["vmem"] = probe_vmem()
    print("vmem:", res["vmem"], flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
