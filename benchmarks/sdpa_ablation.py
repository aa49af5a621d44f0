"""SDPA kernel ablation: where do the ~212us/layer go?

Variants of the fused attention kernel measured standalone at the v3 shape
(b8 x T'=501, 16 heads, d=48):

  A. full kernel (current production `_attn_kernel`)
  B. scores matmul only (write s @ ones back)             -> MXU share
  C. scores + AV, softmax replaced by cheap scale          -> 2x MXU share
  D. full minus the max pass (exp(s) unsafe but timeable)  -> max-pass cost
  E. full with q pre-scaled (scale mul folded out)         -> scale-pass cost
  F. empty-ish kernel (copy q -> o)                        -> grid-cell cost

Each computes garbage except A; all that matters is time.
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

from gigaam_tpu.profiling import device_timeit

B, H, T, D = 8, 16, 501, 48
BLK_Q = 512
NEG_INF = -1e9


def k_full(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    mask = mask_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = s + (mask.astype(jnp.float32) - 1.0) * (-NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o / denom).astype(o_ref.dtype)


def k_scores_only(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale):
    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    # collapse to output shape via a second dot against v so the matmul
    # cannot be DCE'd; no softmax ops at all
    o = jax.lax.dot_general(s.astype(v_ref.dtype), v_ref[0],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def k_no_max(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    mask = mask_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = s + (mask.astype(jnp.float32) - 1.0) * (-NEG_INF)
    p = jnp.exp(s - 20.0)   # static shift instead of row max
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o / denom).astype(o_ref.dtype)


def k_prescaled(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    mask = mask_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s + (mask.astype(jnp.float32) - 1.0) * (-NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o / denom).astype(o_ref.dtype)


def k_maddrow(q_ref, k_ref, v_ref, madd_ref, o_ref, *, scale):
    """mask as a precomputed f32 additive row (no astype/sub/mul chain)."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    madd = madd_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s + madd
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o / denom).astype(o_ref.dtype)


def k_bf16_softmax(q_ref, k_ref, v_ref, madd_ref, o_ref, *, scale):
    """softmax pipeline in bf16 after the f32 max (accuracy-risky probe)."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    madd = madd_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s + madd
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp((s - m).astype(jnp.bfloat16))
    denom = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
    o = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o / denom).astype(o_ref.dtype)


def k_copy(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale):
    o_ref[0] = q_ref[0]


def k_full_packed(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale):
    """Same math as k_full, but blocks sliced from [B, T, H*d] packed
    layout (no [B,H,T,d] transpose outside the kernel)."""
    q = q_ref[0]                                   # [blk_q, d]
    k = k_ref[0]                                   # [T, d]
    v = v_ref[0]
    mask = mask_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = s + (mask.astype(jnp.float32) - 1.0) * (-NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o / denom).astype(o_ref.dtype)


def k_allheads(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale, n_heads):
    """One grid cell per batch sample: loop heads inside the kernel.

    Tests whether the per-cell overhead (DMA issue latency on many small
    blocks) dominates — F_copy_only at 336/443 us says it does."""
    mask = mask_ref[0]                             # [1, T]
    madd = (mask.astype(jnp.float32) - 1.0) * (-NEG_INF)
    for h in range(n_heads):
        q = q_ref[0, h]                            # [T, d]
        k = k_ref[0, h]
        v = v_ref[0, h]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = s + madd
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(v.dtype), v,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, h] = (o / denom).astype(o_ref.dtype)


def run_allheads(q, k, v, mask, label, results, heads_per_cell=H):
    bh = B * H
    t = T
    q4 = q.reshape(B, H, t, D)
    k4 = k.reshape(B, H, t, D)
    v4 = v.reshape(B, H, t, D)
    hc = heads_per_cell
    spec = pl.BlockSpec((1, hc, t, D), lambda i, j: (i, j, 0, 0))
    spec_m = pl.BlockSpec((1, 1, t), lambda i, j: (i, 0, 0))
    fn = pl.pallas_call(
        functools.partial(k_allheads, scale=1.0 / math.sqrt(D), n_heads=hc),
        out_shape=jax.ShapeDtypeStruct((B, H, t, D), q.dtype),
        grid=(B, H // hc),
        in_specs=[spec, spec, spec, spec_m],
        out_specs=spec,
    )

    def call(qq):
        return fn(qq, k4, v4, mask)

    us = device_timeit(call, [q4], k=100, chain=True) * 1e6
    results[label] = round(us, 1)
    print(f"{label:24s} {us:8.1f} us", flush=True)


def run_identity_maps(q, k, v, mask, label, results):
    """Same as A_full but mask pre-broadcast to [BH,1,T] so every
    index map is trivial (no div/rem scalar work per cell)."""
    bh = B * H
    t = T
    blk = BLK_Q
    mask_bh = jnp.broadcast_to(mask[:, None], (B, H, 1, t)).reshape(bh, 1, t)
    spec_q = pl.BlockSpec((1, blk, D), lambda i, j: (i, j, 0))
    spec_kv = pl.BlockSpec((1, t, D), lambda i, j: (i, 0, 0))
    spec_m = pl.BlockSpec((1, 1, t), lambda i, j: (i, 0, 0))
    fn = pl.pallas_call(
        functools.partial(k_full, scale=1.0 / math.sqrt(D)),
        out_shape=jax.ShapeDtypeStruct((bh, t, D), q.dtype),
        grid=(bh, pl.cdiv(t, blk)),
        in_specs=[spec_q, spec_kv, spec_kv, spec_m],
        out_specs=spec_q,
    )

    def call(qq):
        return fn(qq, k, v, mask_bh)

    us = device_timeit(call, [q], k=100, chain=True) * 1e6
    results[label] = round(us, 1)
    print(f"{label:24s} {us:8.1f} us", flush=True)


def run_packed(q3, k3, v3, mask, label, results):
    """q3/k3/v3 [B, T, H*d]; grid (B*H, n_q); head = lane-block slice."""
    t = T
    blk = BLK_Q
    spec_q = pl.BlockSpec((1, blk, D), lambda i, j: (i // H, j, i % H))
    spec_kv = pl.BlockSpec((1, t, D), lambda i, j: (i // H, 0, i % H))
    spec_m = pl.BlockSpec((1, 1, t), lambda i, j: (i // H, 0, 0))
    fn = pl.pallas_call(
        functools.partial(k_full_packed, scale=1.0 / math.sqrt(D)),
        out_shape=jax.ShapeDtypeStruct((B, t, H * D), q3.dtype),
        grid=(B * H, pl.cdiv(t, blk)),
        in_specs=[spec_q, spec_kv, spec_kv, spec_m],
        out_specs=spec_q,
    )

    def call(qq):
        return fn(qq, k3, v3, mask)

    us = device_timeit(call, [q3], k=100, chain=True) * 1e6
    results[label] = round(us, 1)
    print(f"{label:24s} {us:8.1f} us", flush=True)


def run(kernel, q, k, v, mask, label, results, madd=False):
    bh = B * H
    t = T
    blk = BLK_Q
    spec_q = pl.BlockSpec((1, blk, D), lambda i, j: (i, j, 0))
    spec_kv = pl.BlockSpec((1, t, D), lambda i, j: (i, 0, 0))
    spec_m = pl.BlockSpec((1, 1, t), lambda i, j: (i // H, 0, 0))
    fn = pl.pallas_call(
        functools.partial(kernel, scale=1.0 / math.sqrt(D)),
        out_shape=jax.ShapeDtypeStruct((bh, t, D), q.dtype),
        grid=(bh, pl.cdiv(t, blk)),
        in_specs=[spec_q, spec_kv, spec_kv, spec_m],
        out_specs=spec_q,
    )

    def call(qq):
        return fn(qq, k, v, mask)

    us = device_timeit(call, [q], k=100, chain=True) * 1e6
    results[label] = round(us, 1)
    print(f"{label:24s} {us:8.1f} us", flush=True)


def main():
    rng = np.random.default_rng(0)
    bh = B * H
    q = jnp.asarray(rng.standard_normal((bh, T, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((bh, T, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((bh, T, D)), jnp.bfloat16)
    mask = jnp.ones((B, 1, T), jnp.int8)
    madd = jnp.zeros((B, 1, T), jnp.float32)

    results = {}
    run(k_full, q, k, v, mask, "A_full", results)
    run(k_copy, q, k, v, mask, "F_copy_only", results)
    run_allheads(q, k, v, mask, "I_allheads_cell", results)
    run_allheads(q, k, v, mask, "J_4heads_cell", results, heads_per_cell=4)
    run_identity_maps(q, k, v, mask, "K_identity_maps", results)
    if os.environ.get("SDPA_ABLATION_FULLSET"):
        run(k_scores_only, q, k, v, mask, "B_two_matmuls", results)
        run(k_no_max, q, k, v, mask, "D_no_max_pass", results)
        run(k_prescaled, q, k, v, mask, "E_prescaled_q", results)
        run(k_maddrow, q, k, v, madd, "E2_madd_row", results)
        run(k_bf16_softmax, q, k, v, madd, "G_bf16_softmax", results)
    if os.environ.get("SDPA_ABLATION_PACKED"):
        try:
            q3 = jnp.asarray(
                np.ascontiguousarray(
                    np.asarray(q).reshape(B, H, T, D).transpose(0, 2, 1, 3)
                    .reshape(B, T, H * D)), jnp.bfloat16)
            run_packed(q3, q3, q3, mask, "H_packed_lane_slice", results)
        except Exception as e:  # Mosaic may reject 48-lane partial blocks
            results["H_packed_lane_slice"] = f"failed: {type(e).__name__}"
            print(f"H_packed_lane_slice failed: {e}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
