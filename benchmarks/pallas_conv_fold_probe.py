"""Probe: fold the whole Conformer conv sub-block into one Pallas kernel.

Sub-block (inference): LN -> pointwise value/gate (GLU) -> zero padded
tail -> depthwise(k=31) -> BN(infer, affine) -> SiLU -> pointwise ->
residual add.  Composed cost at b32 x 512 ~ conv module 524 us + LN 81 us
+ residual pass; the three [T, 768] x [768, 768] matmuls' floor is
~378 us, so a VMEM-resident fold has a real glue prize IF the in-kernel
depthwise (31 shifted FMAs over the sublane axis) is cheap on the VPU.

  baseline : jit(x + conformer_conv(layer_norm(x)))   — the in-model path
  foldConv : one kernel; depthwise as 31 static slices of a zero-padded
             [T+30, 768] buffer; BN folded to scale/bias
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

from gigaam_tpu.ops.conformer_ops import conformer_conv, layer_norm
from gigaam_tpu.profiling import device_timeit

D, K = 768, 31


def _conv_lnres_kernel(x_ref, g_ref, be_ref, wv_ref, bv_ref, wg_ref,
                       bg_ref, dw_ref, bns_ref, bnb_ref, w2_ref, b2_ref,
                       mask_ref, o_ref, *, t: int, nb: int):
    d = x_ref.shape[-1]
    xin = x_ref[:].reshape(nb * t, d)
    xf = xin.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
    xn = (xn * g_ref[:] + be_ref[:]).astype(xin.dtype)

    v = (jnp.dot(xn, wv_ref[:], preferred_element_type=jnp.float32)
         + bv_ref[:])
    gt = (jnp.dot(xn, wg_ref[:], preferred_element_type=jnp.float32)
          + bg_ref[:])
    y = (v * jax.nn.sigmoid(gt)).astype(xin.dtype)         # GLU
    # zero the padded tail (batched == single-sample numerics: the
    # depthwise window must not read log-mel pad garbage); mask arrives
    # [nb, t, 1] so the reshape to rows is layout-trivial
    y = y * mask_ref[:].reshape(nb * t, 1).astype(y.dtype)

    pad = (K - 1) // 2
    zpad = 16                                              # 8-aligned > pad
    outs = []
    for ib in range(nb):
        yb = y[ib * t:(ib + 1) * t]
        ypad = jnp.concatenate(
            [jnp.zeros((zpad, d), y.dtype), yb,
             jnp.zeros((zpad, d), y.dtype)])
        acc = jnp.zeros((t, d), jnp.float32)
        off = zpad - pad
        for k in range(K):
            acc += (ypad[off + k:off + k + t].astype(jnp.float32)
                    * dw_ref[k][None, :])
        outs.append(acc)
    c = outs[0] if nb == 1 else jnp.concatenate(outs, axis=0)
    c = c * bns_ref[:] + bnb_ref[:]                        # BN affine (fp32)
    c = (c * jax.nn.sigmoid(c)).astype(xin.dtype)          # SiLU
    out = (jnp.dot(c, w2_ref[:], preferred_element_type=jnp.float32)
           + b2_ref[:])
    att = out.reshape(nb, t, d).astype(o_ref.dtype)
    o_ref[:] = att + x_ref[:]


def conv_lnres_folded(ln_p, p, x, valid, nb: int):
    b, t, d = x.shape
    assert b % nb == 0
    dt = x.dtype
    f32 = jnp.float32
    g = ln_p["scale"].astype(f32)[None, :]
    be = ln_p["bias"].astype(f32)[None, :]
    pc1 = p["pointwise_conv1"]
    wv = pc1["w_value"].astype(dt)
    bv = pc1["b_value"].astype(f32)[None, :]
    wg = pc1["w_gate"].astype(dt)
    bg = pc1["b_gate"].astype(f32)[None, :]
    dw = p["depthwise_conv"]["w"].reshape(K, d).astype(f32)   # [K,1,C]
    dwb = p["depthwise_conv"].get("b")
    bn = p["batch_norm"]
    inv = jax.lax.rsqrt(bn["var"].astype(f32) + 1e-5)
    bns = (bn["scale"].astype(f32) * inv)[None, :]
    bnb = (bn["bias"].astype(f32)
           - bn["mean"].astype(f32) * bn["scale"].astype(f32) * inv)[None, :]
    if dwb is not None:                                       # fold dw bias
        bnb = bnb + dwb.astype(f32)[None, :] * bns
    w2 = p["pointwise_conv2"]["w"].astype(dt)
    b2 = p["pointwise_conv2"]["b"].astype(f32)[None, :]
    mask = valid.astype(jnp.int8)[:, :, None]   # [B, T, 1]

    kernel = functools.partial(_conv_lnres_kernel, t=t, nb=nb)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)
    rows = pl.BlockSpec((nb, t, d), lambda i: (i, 0, 0))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, t, d), dt),
        grid=(b // nb,),
        in_specs=[rows, full(g), full(be), full(wv), full(bv), full(wg),
                  full(bg), full(dw), full(bns), full(bnb), full(w2),
                  full(b2), pl.BlockSpec((nb, t, 1), lambda i: (i, 0, 0))],
        out_specs=rows,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, g, be, wv, bv, wg, bg, dw, bns, bnb, w2, b2, mask)


def run(b: int, t: int, nb: int):
    rng = np.random.default_rng(0)
    f32a = lambda *s: jnp.asarray(0.05 * rng.standard_normal(s), jnp.float32)
    p = {
        "pointwise_conv1": {"w_value": f32a(D, D), "b_value": f32a(D),
                            "w_gate": f32a(D, D), "b_gate": f32a(D)},
        "depthwise_conv": {"w": f32a(K, 1, D), "b": f32a(D)},
        "batch_norm": {"scale": 1.0 + f32a(D), "bias": f32a(D),
                       "mean": f32a(D), "var": 1.0 + jnp.abs(f32a(D))},
        "pointwise_conv2": {"w": f32a(D, D), "b": f32a(D)},
    }
    ln_p = {"scale": 1.0 + f32a(D), "bias": f32a(D)}
    x = jnp.asarray(0.5 * rng.standard_normal((b, t, D)), jnp.bfloat16)
    lens = np.full((b,), t)
    lens[1:] = max(1, t - 77)
    valid = jnp.asarray(np.arange(t)[None, :] < lens[:, None])

    res = {}
    base = jax.jit(lambda xx: xx + conformer_conv(
        p, layer_norm(ln_p, xx), valid, "batch_norm")[0])
    dt_b = device_timeit(lambda xx: base(xx), [x], k=40)
    res["baseline_us"] = round(dt_b * 1e6, 1)
    want = np.asarray(base(x), np.float32)

    fold = jax.jit(lambda xx: conv_lnres_folded(ln_p, p, xx, valid, nb))
    got = np.asarray(fold(x), np.float32)
    tmin = int(lens.min())
    err = (np.abs(got - want) / (np.abs(want) + 1.0))[:, :tmin]
    res["maxrel"] = float(err.max())
    dt_f = device_timeit(lambda xx: fold(xx), [x], k=40)
    res["foldConv_us"] = round(dt_f * 1e6, 1)
    res["delta_pct"] = round(100.0 * (dt_f - dt_b) / dt_b, 1)
    print(f"b{b} t{t} nb{nb}: baseline {res['baseline_us']} us, "
          f"foldConv {res['foldConv_us']} us ({res['delta_pct']:+}%), "
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
