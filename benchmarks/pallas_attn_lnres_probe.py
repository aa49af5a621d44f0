"""Probe: fold the pre-attention LayerNorm AND the residual add into the
folded attention-module kernel.

The round-5 folded kernel (``ops/pallas_attention.py::folded_rotary_attention``)
eats the module between LN and residual; the remaining per-layer glue
around it is two bandwidth-bound passes over [B, T, 768]:

  LN       reads x, writes y      (2 passes)
  residual reads x and attn(y), writes r   (3 passes)

~5 extra HBM passes/layer IF XLA does not already overlap/fuse them into
the neighboring ops.  The stage profile suggests substantial overlap
(in-model layer time < sum of its standalone pieces), so this probe
measures the real marginal win of a kernel that takes pre-LN x and
returns x + attn(LN(x)) directly:

  baseline : jit(x + shipped_folded_attention(LN(x)))  — the in-model path
  foldLN   : one kernel, LN in fp32 in-VMEM, residual add in fp32

Run on the chip; parity is checked against the baseline on valid rows.
"""

from __future__ import annotations

import functools
import json
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gigaam_tpu.ops.conformer_ops import layer_norm
from gigaam_tpu.ops.pallas_attention import folded_rotary_attention
from gigaam_tpu.profiling import device_timeit

D, H = 768, 16
DH = D // H
NEG_INF = -1e9


def _lnres_kernel(x_ref, g_ref, be_ref, cos_ref, sin_ref, r_ref, wq_ref,
                  wk_ref, wv_ref, wo_ref, bq_ref, bk_ref, bv_ref, bo_ref,
                  mask_ref, o_ref, *, t: int, nb: int):
    xin = x_ref[:].reshape(nb * t, D)
    xf = xin.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    xn_f = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
    xn_f = xn_f * g_ref[:] + be_ref[:]
    x = xn_f.astype(xin.dtype)

    xrot = jnp.dot(x, r_ref[:], preferred_element_type=jnp.float32)
    cs = cos_ref[:]
    sn = sin_ref[:]
    if nb > 1:
        cs = jnp.concatenate([cs] * nb, axis=0)
        sn = jnp.concatenate([sn] * nb, axis=0)
    xr = (x.astype(jnp.float32) * cs + xrot * sn).astype(x.dtype)

    wq = wq_ref[:]
    wk = wk_ref[:]
    wv = wv_ref[:]
    q = (jnp.dot(xr, wq, preferred_element_type=jnp.float32)
         + bq_ref[:]).astype(x.dtype)
    k = (jnp.dot(xr, wk, preferred_element_type=jnp.float32)
         + bk_ref[:]).astype(x.dtype)
    v = (jnp.dot(x, wv, preferred_element_type=jnp.float32)
         + bv_ref[:]).astype(x.dtype)
    outs = []
    for ib in range(nb):
        madd = (mask_ref[ib].astype(jnp.float32) - 1.0) * (-NEG_INF)
        rsl = slice(ib * t, (ib + 1) * t)
        row_acc = jnp.zeros((t, D), jnp.float32)
        for h in range(H):
            sl = slice(h * DH, (h + 1) * DH)
            qh, kh, vh = q[rsl, sl], k[rsl, sl], v[rsl, sl]
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s + madd
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            denom = jnp.sum(p, axis=-1, keepdims=True)
            oh = jax.lax.dot_general(
                p.astype(x.dtype), vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            oh = (oh / denom).astype(x.dtype)
            row_acc += jnp.dot(oh, wo_ref[h * DH:(h + 1) * DH, :],
                               preferred_element_type=jnp.float32)
        # residual in fp32 against the kernel's own input rows
        outs.append(row_acc + bo_ref[:] + xf[rsl])
    out = outs[0] if nb == 1 else jnp.concatenate(outs, axis=0)
    o_ref[:] = out.reshape(nb, t, D).astype(o_ref.dtype)


def lnres_folded(ln_params, params, x, cos_w, sin_w, r, valid, nb: int):
    b, t, _ = x.shape
    assert b % nb == 0
    dt = x.dtype
    scale = 1.0 / math.sqrt(DH)
    g = ln_params["scale"].astype(jnp.float32)[None, :]
    be = ln_params["bias"].astype(jnp.float32)[None, :]
    wq = (params["linear_q"]["w"] * scale).astype(dt)
    wk = params["linear_k"]["w"].astype(dt)
    wv = params["linear_v"]["w"].astype(dt)
    wo = params["linear_out"]["w"].astype(dt)
    bq = (params["linear_q"]["b"] * scale).astype(jnp.float32)[None, :]
    bk = params["linear_k"]["b"].astype(jnp.float32)[None, :]
    bv = params["linear_v"]["b"].astype(jnp.float32)[None, :]
    bo = params["linear_out"]["b"].astype(jnp.float32)[None, :]
    mask8 = valid.astype(jnp.int8)[:, None, :]

    kernel = functools.partial(_lnres_kernel, t=t, nb=nb)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)
    rows = pl.BlockSpec((nb, t, D), lambda i: (i, 0, 0))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, t, D), dt),
        grid=(b // nb,),
        in_specs=[rows, full(g), full(be), full(cos_w), full(sin_w),
                  full(r), full(wq), full(wk), full(wv), full(wo),
                  full(bq), full(bk), full(bv), full(bo),
                  pl.BlockSpec((nb, 1, t), lambda i: (i, 0, 0))],
        out_specs=rows,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, g, be, cos_w, sin_w, r, wq, wk, wv, wo, bq, bk, bv, bo, mask8)


def run(b: int, t: int, nb: int):
    rng = np.random.default_rng(0)

    def lin(i):
        r2 = np.random.default_rng(100 + i)
        return {"w": jnp.asarray(0.05 * r2.standard_normal((D, D)),
                                 jnp.float32),
                "b": jnp.asarray(0.01 * r2.standard_normal((D,)),
                                 jnp.float32)}

    params = {"linear_q": lin(0), "linear_k": lin(1), "linear_v": lin(2),
              "linear_out": lin(3)}
    ln_p = {"scale": jnp.asarray(1.0 + 0.1 * rng.standard_normal(D),
                                 jnp.float32),
            "bias": jnp.asarray(0.1 * rng.standard_normal(D), jnp.float32)}
    x = jnp.asarray(0.5 * rng.standard_normal((b, t, D)), jnp.bfloat16)
    lens = np.full((b,), t)
    lens[1:] = max(1, t - 77)
    valid = jnp.asarray(np.arange(t)[None, :] < lens[:, None])

    from gigaam_tpu.ops.rotary import rotary_tables

    cos_np, sin_np = rotary_tables(t, DH, 5000.0)
    cos_t, sin_t = jnp.asarray(cos_np), jnp.asarray(sin_np)
    cos_w = jnp.tile(cos_t.astype(jnp.float32), (1, H))
    sin_w = jnp.tile(sin_t.astype(jnp.float32), (1, H))
    from gigaam_tpu.ops.pallas_attention import _rope_perm_matrix

    r = jnp.asarray(_rope_perm_matrix(H, DH), jnp.bfloat16)

    res = {}
    base = jax.jit(lambda xx: xx + folded_rotary_attention(
        params, layer_norm(ln_p, xx), cos_t, sin_t, valid, H))
    dt_b = device_timeit(lambda xx: base(xx), [x], k=40)
    res["baseline_us"] = round(dt_b * 1e6, 1)
    want = np.asarray(base(x), np.float32)

    fold = jax.jit(lambda xx: lnres_folded(ln_p, params, xx, cos_w, sin_w,
                                           r, valid, nb))
    got = np.asarray(fold(x), np.float32)
    err = np.abs(got[:, :lens.min()] - want[:, :lens.min()])
    den = np.abs(want[:, :lens.min()]) + 1.0
    res["maxrel"] = float((err / den).max())
    dt_f = device_timeit(lambda xx: fold(xx), [x], k=40)
    res["foldLN_us"] = round(dt_f * 1e6, 1)
    res["delta_pct"] = round(100.0 * (dt_f - dt_b) / dt_b, 1)
    print(f"b{b} t{t} nb{nb}: baseline {res['baseline_us']} us, "
          f"foldLN {res['foldLN_us']} us ({res['delta_pct']:+}%), "
          f"maxrel {res['maxrel']:.4f}", flush=True)
    return res


def main():
    out = {}
    for b, t, nb in ((8, 512, 1), (32, 512, 1), (128, 768, 4)):
        key = f"b{b}_t{t}"
        try:
            out[key] = run(b, t, nb)
        except Exception as e:  # noqa: BLE001
            out[key] = {"error": str(e)[:300]}
            print(f"{key}: FAILED {str(e)[:200]}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
