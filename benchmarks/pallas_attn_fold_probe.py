"""Probe: fully-folded attention-module kernel vs the composed path.

Round-4 identified ~100 ms at b128 x T'=750 locked in the glue around the
SDPA kernel: RoPE (1.75 ms/layer), QKV projections' HBM round trips, and
the head split/merge relayouts (~3 ms/layer).  The fold attempts died on
remote-compile HTTP 500s — which round-5 probing strongly suggests were
VMEM OOMs against the default 16 MB scoped limit (raising
``vmem_limit_bytes`` fixed an identical 500 on the subsampling probe, and
the chip accepts 120 MB scratch).

This probe times one *whole attention module* (post-LN input -> attention
output, biases included) three ways on the chip:

  baseline : the shipped composed path — ``apply_rotary_wide`` + XLA
             projections + ``fused_mha`` + folded out-projection
  foldA    : one Pallas kernel/batch-row; per-head q/k/v via pre-sliced
             [768,48] weight blocks (N=48 matmuls, no lane slicing)
  foldB    : one Pallas kernel/batch-row; full [768,768] projections then
             per-head lane slices q[:, 48h:48h+48] (relayout cost probe)

RoPE inside the folded kernels is a ±1 permutation MATMUL (x @ R), not a
lane gather: exact (products are exact zeros or ±x), and ~5 us of MXU.
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

from gigaam_tpu.profiling import device_timeit

D, H = 768, 16
DH = D // H
NEG_INF = -1e9


def rope_tables_wide(cos: np.ndarray, sin: np.ndarray):
    """Tile per-head cos/sin [T, 48] to the flat-lane layout [T, 768] and
    build the rotate-half permutation matrix R [D, D] (per 48-lane head
    group: rot(x) = [-x2; x1], same convention as ``ops/rotary.py``)."""
    cos_w = np.tile(np.asarray(cos), (1, H)).astype(np.float32)  # [T, 768]
    sin_w = np.tile(np.asarray(sin), (1, H)).astype(np.float32)
    r = np.zeros((D, D), np.float32)
    half = DH // 2
    for h in range(H):
        o = h * DH
        for i in range(half):
            r[o + half + i, o + i] = -1.0               # rot[i] = -x[i+half]
            r[o + i, o + half + i] = 1.0                # rot[i+half] = x[i]
    return cos_w, sin_w, r


def _fold_kernel(x_ref, cos_ref, sin_ref, r_ref, wq_ref, wk_ref, wv_ref,
                 wo_ref, bq_ref, bk_ref, bv_ref, bo_ref, mask_ref, o_ref,
                 *, t: int, per_head_weights: bool):
    x = x_ref[0]                                        # [T, 768] bf16
    xrot = jnp.dot(x, r_ref[:], preferred_element_type=jnp.float32)
    xr = (x.astype(jnp.float32) * cos_ref[:]
          + xrot * sin_ref[:]).astype(x.dtype)
    # NOTE: 1/sqrt(d_h) is pre-folded into wq AND bq by the caller
    mask = mask_ref[0]                                  # [1, T] int8
    madd = (mask.astype(jnp.float32) - 1.0) * (-NEG_INF)

    if per_head_weights:
        v_full = jnp.dot(x, wv_ref[:].reshape(D, D),
                         preferred_element_type=jnp.float32) + bv_ref[:]
        v_full = v_full.astype(x.dtype)
        acc = jnp.zeros((t, D), jnp.float32)
        for h in range(H):
            wq_h = wq_ref[h]                            # [768, 48]
            wk_h = wk_ref[h]
            qh = (jnp.dot(xr, wq_h, preferred_element_type=jnp.float32)
                  + bq_ref[0, h * DH:(h + 1) * DH]).astype(x.dtype)
            kh = (jnp.dot(xr, wk_h, preferred_element_type=jnp.float32)
                  + bk_ref[0, h * DH:(h + 1) * DH]).astype(x.dtype)
            vh = v_full[:, h * DH:(h + 1) * DH]
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
            acc += jnp.dot(oh, wo_ref[h * DH:(h + 1) * DH, :],
                           preferred_element_type=jnp.float32)
        o_ref[0] = (acc + bo_ref[:]).astype(o_ref.dtype)
    else:
        wq = wq_ref[:].reshape(D, D)
        wk = wk_ref[:].reshape(D, D)
        wv = wv_ref[:].reshape(D, D)
        q = (jnp.dot(xr, wq, preferred_element_type=jnp.float32)
             + bq_ref[:]).astype(x.dtype)
        k = (jnp.dot(xr, wk, preferred_element_type=jnp.float32)
             + bk_ref[:]).astype(x.dtype)
        v = (jnp.dot(x, wv, preferred_element_type=jnp.float32)
             + bv_ref[:]).astype(x.dtype)
        acc = jnp.zeros((t, D), jnp.float32)
        for h in range(H):
            sl = slice(h * DH, (h + 1) * DH)
            qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]
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
            acc += jnp.dot(oh, wo_ref[h * DH:(h + 1) * DH, :],
                           preferred_element_type=jnp.float32)
        o_ref[0] = (acc + bo_ref[:]).astype(o_ref.dtype)


def _fold_kernel_nb(x_ref, cos_ref, sin_ref, r_ref, wq_ref, wk_ref, wv_ref,
                    wo_ref, bq_ref, bk_ref, bv_ref, bo_ref, mask_ref, o_ref,
                    *, t: int, nb: int):
    """nb batch rows per cell: projections run at M = nb*T (better MXU
    fill), the per-(row, head) SDPA chains stay independent for the
    scheduler to interleave MXU matmuls with VPU softmaxes."""
    x = x_ref[:].reshape(nb * t, D)
    xrot = jnp.dot(x, r_ref[:], preferred_element_type=jnp.float32)
    cs = jnp.concatenate([cos_ref[:]] * nb, axis=0)
    sn = jnp.concatenate([sin_ref[:]] * nb, axis=0)
    xr = (x.astype(jnp.float32) * cs + xrot * sn).astype(x.dtype)
    # NOTE: 1/sqrt(d_h) is pre-folded into wq AND bq by the caller

    wq = wq_ref[:].reshape(D, D)
    wk = wk_ref[:].reshape(D, D)
    wv = wv_ref[:].reshape(D, D)
    q = (jnp.dot(xr, wq, preferred_element_type=jnp.float32)
         + bq_ref[:]).astype(x.dtype)
    k = (jnp.dot(xr, wk, preferred_element_type=jnp.float32)
         + bk_ref[:]).astype(x.dtype)
    v = (jnp.dot(x, wv, preferred_element_type=jnp.float32)
         + bv_ref[:]).astype(x.dtype)
    acc = jnp.zeros((nb * t, D), jnp.float32)
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
        outs.append(row_acc + bo_ref[:])
    o_ref[:] = jnp.concatenate(outs, axis=0).reshape(
        nb, t, D).astype(o_ref.dtype)


def folded_attention_nb(x, params, cos_w, sin_w, r, valid, nb: int,
                        interpret: bool = False):
    b, t, _ = x.shape
    assert b % nb == 0
    scale_q = 1.0 / math.sqrt(DH)
    wq = (params["linear_q"]["w"] * scale_q).astype(x.dtype)[None]
    wk = params["linear_k"]["w"].astype(x.dtype)[None]
    wv = params["linear_v"]["w"].astype(x.dtype)[None]
    wo = params["linear_out"]["w"].astype(x.dtype)
    # the 1/sqrt(d_h) fold must hit the bias too, or the logits carry an
    # unscaled +bq term and parity vs the composed baseline is mismatched
    bq = (params["linear_q"]["b"] * scale_q).astype(jnp.float32)[None, :]
    bk = params["linear_k"]["b"].astype(jnp.float32)[None, :]
    bv = params["linear_v"]["b"].astype(jnp.float32)[None, :]
    bo = params["linear_out"]["b"].astype(jnp.float32)[None, :]
    mask8 = valid.astype(jnp.int8)[:, None, :]

    kernel = functools.partial(_fold_kernel_nb, t=t, nb=nb)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)
    rows = pl.BlockSpec((nb, t, D), lambda i: (i, 0, 0))
    args = [x, cos_w, sin_w, r, wq, wk, wv, wo, bq, bk, bv, bo, mask8]
    specs = [rows, full(cos_w), full(sin_w), full(r), full(wq), full(wk),
             full(wv), full(wo), full(bq), full(bk), full(bv), full(bo),
             pl.BlockSpec((nb, 1, t), lambda i: (i, 0, 0))]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, t, D), x.dtype),
        grid=(b // nb,),
        in_specs=specs,
        out_specs=rows,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def folded_attention(x, params, cos_w, sin_w, r, valid,
                     per_head_weights: bool, interpret: bool = False):
    """x [B, T, 768] post-LN -> attention module output [B, T, 768]."""
    b, t, _ = x.shape
    wq = (params["linear_q"]["w"] / math.sqrt(DH)).astype(x.dtype)
    wk = params["linear_k"]["w"].astype(x.dtype)
    wv = params["linear_v"]["w"].astype(x.dtype)
    wo = params["linear_out"]["w"].astype(x.dtype)
    if per_head_weights:
        wq_in = wq.reshape(D, H, DH).transpose(1, 0, 2)   # [H, 768, 48]
        wk_in = wk.reshape(D, H, DH).transpose(1, 0, 2)
        wv_in = wv[None]                                  # [1, 768, 768]
    else:
        wq_in, wk_in, wv_in = wq[None], wk[None], wv[None]
    bq = (params["linear_q"]["b"] / math.sqrt(DH)).astype(jnp.float32)[None, :]
    bk = params["linear_k"]["b"].astype(jnp.float32)[None, :]
    bv = params["linear_v"]["b"].astype(jnp.float32)[None, :]
    bo = params["linear_out"]["b"].astype(jnp.float32)[None, :]
    mask8 = valid.astype(jnp.int8)[:, None, :]

    kernel = functools.partial(_fold_kernel, t=t,
                               per_head_weights=per_head_weights)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)
    row = pl.BlockSpec((1, t, D), lambda i: (i, 0, 0))
    args = [x, cos_w, sin_w, r, wq_in, wk_in, wv_in, wo,
            bq, bk, bv, bo, mask8]
    specs = [row, full(cos_w), full(sin_w), full(r), full(wq_in),
             full(wk_in), full(wv_in), full(wo), full(bq), full(bk),
             full(bv), full(bo),
             pl.BlockSpec((1, 1, t), lambda i: (i, 0, 0))]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, t, D), x.dtype),
        grid=(b,),
        in_specs=specs,
        out_specs=row,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def baseline_attention(x, params, cos, sin, valid):
    """The shipped composed path (rotary_mha with the fused SDPA core)."""
    from gigaam_tpu.ops.attention import rotary_mha

    return rotary_mha(params, x, cos, sin, valid, H, use_fused=True)


def make_params(rng):
    def lin(key_shift, d_in, d_out):
        return {
            "w": jnp.asarray(0.03 * rng.standard_normal((d_in, d_out)),
                             jnp.float32),
            "b": jnp.asarray(0.01 * rng.standard_normal((d_out,)),
                             jnp.float32),
        }

    return {
        "linear_q": lin(0, D, D),
        "linear_k": lin(1, D, D),
        "linear_v": lin(2, D, D),
        "linear_out": lin(3, D, D),
    }


def run(b: int, t: int, check: bool = True):
    rng = np.random.default_rng(0)
    params = make_params(rng)
    x = jnp.asarray(0.5 * rng.standard_normal((b, t, D)), jnp.bfloat16)
    lens = np.full((b,), t)
    lens[1:] = max(1, t - 77)
    valid = jnp.asarray(np.arange(t)[None, :] < lens[:, None])
    from gigaam_tpu.ops.rotary import rotary_tables

    cos_np, sin_np = rotary_tables(t, DH, 5000.0)
    cos_t, sin_t = jnp.asarray(cos_np), jnp.asarray(sin_np)
    cos_w_np, sin_w_np, r_np = rope_tables_wide(cos_np, sin_np)
    cos_w = jnp.asarray(cos_w_np)
    sin_w = jnp.asarray(sin_w_np)
    r = jnp.asarray(r_np, jnp.bfloat16)

    res = {}
    base = jax.jit(lambda xx: baseline_attention(xx, params, cos_t, sin_t,
                                                 valid))
    dt = device_timeit(lambda xx: base(xx), [x], k=40)
    res["baseline_us"] = round(dt * 1e6, 1)
    print(f"b{b} t{t} baseline: {res['baseline_us']} us", flush=True)

    want = np.asarray(base(x), np.float32)

    def check_and_time(name, f):
        try:
            got = np.asarray(f(x), np.float32)
            if check:
                # same math, different blocking: bf16-level agreement on
                # valid rows (padded query rows are garbage by contract)
                err = np.abs(got[:, :lens.min()] - want[:, :lens.min()])
                den = np.abs(want[:, :lens.min()]) + 1.0
                res[f"{name}_maxrel"] = float((err / den).max())
            dt = device_timeit(lambda xx: f(xx), [x], k=40)
            res[f"{name}_us"] = round(dt * 1e6, 1)
            print(f"b{b} t{t} {name}: {res[f'{name}_us']} us "
                  f"(maxrel {res.get(f'{name}_maxrel')})", flush=True)
        except Exception as e:  # noqa: BLE001
            res[f"{name}_error"] = str(e)[:300]
            print(f"b{b} t{t} {name}: FAILED {str(e)[:200]}", flush=True)

    check_and_time("foldB_laneslice", jax.jit(lambda xx: folded_attention(
        xx, params, cos_w, sin_w, r, valid, per_head_weights=False)))
    for nb in (2, 4):
        if b % nb == 0:
            check_and_time(
                f"foldC_nb{nb}",
                jax.jit(lambda xx, nb=nb: folded_attention_nb(
                    xx, params, cos_w, sin_w, r, valid, nb=nb)))
    return res


def main():
    out = {}
    for b, t in ((8, 512), (32, 512), (16, 768), (128, 768)):
        out[f"b{b}_t{t}"] = run(b, t)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
