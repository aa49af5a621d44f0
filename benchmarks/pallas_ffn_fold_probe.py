"""Probe: fold LN + macaron-FFN + 0.5*residual into one Pallas kernel.

The attention sub-block fold (``pallas_attn_lnres_probe.py``) won because
the composed path pays several bandwidth-bound [B, T, 768] HBM passes
around MXU work that Pallas can keep in VMEM.  The FFN sub-block is the
skeptical case: stage profiling has the XLA FFN at ~92% of peak
(838 us/FFN at b32 vs a 768 us peak floor), so the glue savings (LN +
half-residual + intermediate round trips) compete against Pallas' lower
standalone matmul throughput (~150 vs XLA's effective ~180 TFLOP/s at
these shapes).  This probe settles it on the chip:

  baseline : jit(x + 0.5 * ffn(layer_norm(x)))   — the in-model path
  foldFFN  : one kernel: LN (fp32, VMEM) -> W1 -> SiLU -> W2 -> 0.5 -> +x
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

from gigaam_tpu.ops.conformer_ops import ffn, layer_norm
from gigaam_tpu.profiling import device_timeit

D, DFF = 768, 3072


def _ffn_lnres_kernel(x_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                      o_ref, *, t: int, nb: int):
    d = x_ref.shape[-1]
    xin = x_ref[:].reshape(nb * t, d)
    xf = xin.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
    xn = (xn * g_ref[:] + be_ref[:]).astype(xin.dtype)
    h = (jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32)
         + b1_ref[:])
    h = (h * jax.nn.sigmoid(h)).astype(xin.dtype)          # SiLU in fp32
    y = (jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
         + b2_ref[:])
    att = (0.5 * y).reshape(nb, t, d).astype(o_ref.dtype)
    o_ref[:] = att + x_ref[:]


def ffn_lnres_folded(ln_p, p, x, nb: int):
    b, t, d = x.shape
    assert b % nb == 0
    dt = x.dtype
    f32 = jnp.float32
    g = ln_p["scale"].astype(f32)[None, :]
    be = ln_p["bias"].astype(f32)[None, :]
    w1 = p["linear1"]["w"].astype(dt)
    b1 = p["linear1"]["b"].astype(f32)[None, :]
    w2 = p["linear2"]["w"].astype(dt)
    b2 = p["linear2"]["b"].astype(f32)[None, :]
    kernel = functools.partial(_ffn_lnres_kernel, t=t, nb=nb)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)
    rows = pl.BlockSpec((nb, t, d), lambda i: (i, 0, 0))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, t, d), dt),
        grid=(b // nb,),
        in_specs=[rows, full(g), full(be), full(w1), full(b1), full(w2),
                  full(b2)],
        out_specs=rows,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, g, be, w1, b1, w2, b2)


def run(b: int, t: int, nb: int):
    rng = np.random.default_rng(0)
    p = {"linear1": {"w": jnp.asarray(0.05 * rng.standard_normal((D, DFF)),
                                      jnp.float32),
                     "b": jnp.asarray(0.01 * rng.standard_normal(DFF),
                                      jnp.float32)},
         "linear2": {"w": jnp.asarray(0.05 * rng.standard_normal((DFF, D)),
                                      jnp.float32),
                     "b": jnp.asarray(0.01 * rng.standard_normal(D),
                                      jnp.float32)}}
    ln_p = {"scale": jnp.asarray(1.0 + 0.1 * rng.standard_normal(D),
                                 jnp.float32),
            "bias": jnp.asarray(0.1 * rng.standard_normal(D), jnp.float32)}
    x = jnp.asarray(0.5 * rng.standard_normal((b, t, D)), jnp.bfloat16)

    res = {}
    base = jax.jit(lambda xx: xx + 0.5 * ffn(p, layer_norm(ln_p, xx)))
    dt_b = device_timeit(lambda xx: base(xx), [x], k=40)
    res["baseline_us"] = round(dt_b * 1e6, 1)
    want = np.asarray(base(x), np.float32)

    fold = jax.jit(lambda xx: ffn_lnres_folded(ln_p, p, xx, nb))
    got = np.asarray(fold(x), np.float32)
    err = np.abs(got - want) / (np.abs(want) + 1.0)
    res["maxrel"] = float(err.max())
    dt_f = device_timeit(lambda xx: fold(xx), [x], k=40)
    res["foldFFN_us"] = round(dt_f * 1e6, 1)
    res["delta_pct"] = round(100.0 * (dt_f - dt_b) / dt_b, 1)
    print(f"b{b} t{t} nb{nb}: baseline {res['baseline_us']} us, "
          f"foldFFN {res['foldFFN_us']} us ({res['delta_pct']:+}%), "
          f"maxrel {res['maxrel']:.4f}", flush=True)
    return res


def main():
    out = {}
    for b, t, nb in ((32, 512, 1), (128, 768, 4)):
        key = f"b{b}_t{t}"
        try:
            out[key] = run(b, t, nb)
        except Exception as e:  # noqa: BLE001
            out[key] = {"error": str(e)[:300]}
            print(f"{key}: FAILED {str(e)[:200]}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
