"""Fused self-attention Pallas kernel for the Conformer encoder.

Replaces the reference's flash-attn CUDA dependency
(``gigaam/encoder.py:258-274``, ``gigaam/utils.py:103-155``) with a
TPU-native design.  Speech-encoder sequences after 4x subsampling are short
(25 s audio -> T' = 625; VAD caps segments at 30 s -> T' <= 750), so the
*entire* K/V for one (batch, head) slice fits in VMEM.  The kernel therefore
streams query blocks against VMEM-resident K/V, computing
scores -> masked softmax -> @V entirely on-chip: the [T, T] score matrix
never touches HBM (the XLA fallback path materializes it per layer).

The rotary embedding is applied *before* the Q/K/V projections in this
architecture (reference quirk, ``gigaam/encoder.py:244-256``), so the kernel
is rope-free — plain masked SDPA.

Falls back to the XLA path when T exceeds the VMEM budget or when not on
TPU (`fused_attention_available`).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec

try:  # pltpu only imports on TPU-enabled jaxlibs
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

NEG_INF = -1e9
# Per-kernel sequence bounds set by VMEM: the plain SDPA kernel holds one
# [block_q, T] fp32 score block + K/V; the rel-pos kernel additionally
# holds the [block_q, ~2T] positional matrix through the shear, ~2-3x the
# footprint, so its bound is half.  Past the bound callers fall back to the
# XLA formulation rather than hitting a Mosaic compile failure (reachable:
# encode_batch/embed_audio have no 25 s cap, so 60 s+ audio gives T'>1500).
_MAX_VMEM_T = 2048
_MAX_VMEM_T_RELPOS = 1024


def fused_attention_available(t: int, kind: str = "sdpa") -> bool:
    bound = _MAX_VMEM_T_RELPOS if kind == "relpos" else _MAX_VMEM_T
    return (_HAS_PLTPU and t <= bound
            and jax.default_backend() not in ("cpu",))


def _balanced_block_q(t: int, block_q: int) -> int:
    """Split t evenly into ceil(t/block_q) q-blocks, rounded up to the
    128-sublane tile.  For t just past a block boundary (e.g. T'=750 with
    block_q=512) a naive clamp leaves the last block mostly padding
    (512+238 -> 53% waste); even splitting gives 2 x 384 (2% waste)."""
    n_q = max(1, -(-t // block_q))
    return max(128, (-(-t // n_q) + 127) // 128 * 128)


def _relpos_geometry(t: int) -> "tuple[int, int]":
    """(p_pad, n_bits) for the rel-pos shear.

    ``p_pad`` lane-aligns the position axis — rolls in the kernel are
    cyclic mod p_pad, and p_pad >= 2t-1 keeps every used index unwrapped.
    ``n_bits`` is the roll-decomposition bit count.  The forward and
    backward kernels must agree on both exactly (the shear indices shift
    otherwise), which is why this lives in one place."""
    p_pad = max(128, ((2 * t - 1 + 127) // 128) * 128)
    n_bits = max(1, math.ceil(math.log2(t)))
    return p_pad, n_bits


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    q = q_ref[0]                                   # [blk_q, d]
    k = k_ref[0]                                   # [T, d]
    v = v_ref[0]
    mask = mask_ref[0]                             # [1, T] int8

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # [blk_q, T]
    # Arithmetic masking (mask in {0,1}: +0 valid, NEG_INF invalid) instead
    # of a boolean select: broadcasting a [1, T] i1 vector trips a Mosaic
    # relayout error when T is not a multiple of the 128-lane tile.
    s = s + (mask.astype(jnp.float32) - 1.0) * (-NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = (o / denom).astype(o_ref.dtype)


def _attn_relpos_kernel(q_ref, k_ref, v_ref, qv_ref, p_ref, mask_ref, o_ref,
                        *, scale: float, t: int, blk_q: int, n_bits: int):
    """Fully-fused Transformer-XL relative-position attention (v1/v2).

    Serves ``gigaam/encoder.py:164-230``.  The XLA formulation materializes
    the positional term ``bd = rel_shift(q_v @ p^T)`` as a [B, H, T, 2T-1]
    HBM object whose pad/reshape shift lowers to a relayout costing ~2.4 ms
    per layer (chip-measured, b8 x T'=512).  Here the positional matmul runs
    per (batch*head, q-block) against the VMEM-resident projected position
    table ``p`` [p_pad, d], and the rel-shift becomes a log2(T)-step shear
    on VMEM data: bias[i, j] = raw[i, (t-1) - (q0+i) + j] via one static
    roll plus a roll+select per bit of the global query row index.  Neither
    scores nor bias ever touch HBM (chip-measured: 1.4 ms -> vs 3.4 ms for
    a bias-from-HBM kernel and 7.4 ms for pure XLA, whole-layer numbers).
    """
    q0 = pl.program_id(1) * blk_q
    q = q_ref[0]                                   # [blk_q, d] (= q + bias_u)
    k = k_ref[0]                                   # [T, d]
    v = v_ref[0]
    qv = qv_ref[0]                                 # [blk_q, d] (= q + bias_v)
    p = p_ref[0]                                   # [p_pad, d]
    mask = mask_ref[0]                             # [1, T] int8

    raw = jax.lax.dot_general(
        qv, p, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)        # [blk_q, p_pad]
    # shear in the input dtype (halves roll/select traffic at bf16); rolls
    # are cyclic mod p_pad and p_pad >= 2t-1 so no valid index ever wraps
    a = jnp.roll(raw.astype(qv.dtype), -(t - 1), axis=1)
    s_i = jax.lax.broadcasted_iota(jnp.int32, (blk_q, 1), 0) + q0
    for b in range(n_bits):
        bit = (jax.lax.shift_right_logical(s_i, b) & 1) == 1
        a = jnp.where(bit, jnp.roll(a, 1 << b, axis=1), a)
    bias = a[:, :t].astype(jnp.float32)

    s = (jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) + bias) * scale
    s = s + (mask.astype(jnp.float32) - 1.0) * (-NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    pr = jnp.exp(s - m)
    denom = jnp.sum(pr, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        pr.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = (o / denom).astype(o_ref.dtype)


_BWD_MAX_T = 768  # full [T,T] probs/grads live in VMEM (covers T'<=750)

# ---------------------------------------------------------------------------
# Fully-folded rotary attention MODULE (inference forward)
#
# One kernel per batch-row group computes the entire attention block:
# RoPE -> Q/K/V projections -> per-head masked SDPA -> output projection,
# with nothing but the [B, T, D] input/output touching HBM.  Kills three
# glue costs of the composed path (chip-measured, PERF.md round 5):
# the RoPE pass (1.75 ms/layer at b128), the q/k/v HBM round trips, and
# the head split/merge relayouts (~3 ms/layer).  RoPE inside the kernel is
# a +-1 permutation MATMUL (x @ R): products are exactly 0 or +-x, so it
# is exact, and it rides the MXU instead of lane-gathering on the VPU.
#
# Round-4 attempts at this fold died on remote-compile HTTP 500s; round-5
# probing showed those were VMEM OOMs against the default 16 MB scoped
# limit — the chip accepts ~120 MB (``benchmarks/pallas_subsampling_probe``)
# and this kernel requests 100 MB.  Measured vs the composed path
# (``benchmarks/pallas_attn_fold_probe.py``): -13% at b32 x T'=512 and
# -22% at b128 x T'=768 per attention module, break-even at b8.
# ---------------------------------------------------------------------------

_MAX_FOLD_T = 1024  # [T,T] fp32 probs + nb*T rows of q/k/v in VMEM


def folded_attention_available(t: int) -> bool:
    return (_HAS_PLTPU and t <= _MAX_FOLD_T
            and jax.default_backend() not in ("cpu",))


@functools.lru_cache(maxsize=None)
def _rope_perm_matrix(n_heads: int, d_head: int):
    """[D, D] rotate-half permutation: (x @ R) == rotate_half per head
    group in the flat-lane layout (``ops/rotary.py::apply_rotary_wide``)."""
    import numpy as np

    d = n_heads * d_head
    half = d_head // 2
    r = np.zeros((d, d), np.float32)
    for h in range(n_heads):
        o = h * d_head
        for i in range(half):
            r[o + half + i, o + i] = -1.0     # rot[i]      = -x[i + half]
            r[o + i, o + half + i] = 1.0      # rot[i+half] =  x[i]
    return r


def _fold_attn_body(x, cos_ref, sin_ref, r_ref, wq_ref, wk_ref, wv_ref,
                    wo_ref, bq_ref, bk_ref, bv_ref, bo_ref, mask_ref,
                    t: int, nb: int, n_heads: int):
    """Shared in-VMEM attention-module body: RoPE (permutation matmul) ->
    Q/K/V projections -> per-(row, head) masked SDPA -> output projection.
    ``x`` is the post-LN input [nb*t, d] in compute dtype; wq/bq arrive
    pre-scaled by 1/sqrt(d_h).  Returns the module output in fp32."""
    d = x.shape[-1]
    dh = d // n_heads
    xrot = jnp.dot(x, r_ref[:], preferred_element_type=jnp.float32)
    cos = cos_ref[:]
    sin = sin_ref[:]
    if nb > 1:
        cos = jnp.concatenate([cos] * nb, axis=0)
        sin = jnp.concatenate([sin] * nb, axis=0)
    xr = (x.astype(jnp.float32) * cos + xrot * sin).astype(x.dtype)

    q = (jnp.dot(xr, wq_ref[:], preferred_element_type=jnp.float32)
         + bq_ref[:]).astype(x.dtype)
    k = (jnp.dot(xr, wk_ref[:], preferred_element_type=jnp.float32)
         + bk_ref[:]).astype(x.dtype)
    v = (jnp.dot(x, wv_ref[:], preferred_element_type=jnp.float32)
         + bv_ref[:]).astype(x.dtype)

    outs = []
    for ib in range(nb):
        madd = (mask_ref[ib].astype(jnp.float32) - 1.0) * (-NEG_INF)
        rsl = slice(ib * t, (ib + 1) * t)
        row_acc = jnp.zeros((t, d), jnp.float32)
        for h in range(n_heads):
            sl = slice(h * dh, (h + 1) * dh)
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
            row_acc += jnp.dot(oh, wo_ref[h * dh:(h + 1) * dh, :],
                               preferred_element_type=jnp.float32)
        outs.append(row_acc + bo_ref[:])
    return outs[0] if nb == 1 else jnp.concatenate(outs, axis=0)


def _fold_rotary_kernel(x_ref, cos_ref, sin_ref, r_ref, wq_ref, wk_ref,
                        wv_ref, wo_ref, bq_ref, bk_ref, bv_ref, bo_ref,
                        mask_ref, o_ref, *, t: int, nb: int, n_heads: int):
    """nb batch rows per grid cell; wq arrives pre-scaled by 1/sqrt(d_h)."""
    d = x_ref.shape[-1]
    x = x_ref[:].reshape(nb * t, d)
    out = _fold_attn_body(x, cos_ref, sin_ref, r_ref, wq_ref, wk_ref,
                          wv_ref, wo_ref, bq_ref, bk_ref, bv_ref, bo_ref,
                          mask_ref, t, nb, n_heads)
    o_ref[:] = out.reshape(nb, t, d).astype(o_ref.dtype)


def _fold_rotary_lnres_kernel(x_ref, g_ref, be_ref, cos_ref, sin_ref,
                              r_ref, wq_ref, wk_ref, wv_ref, wo_ref,
                              bq_ref, bk_ref, bv_ref, bo_ref, mask_ref,
                              o_ref, *, t: int, nb: int, n_heads: int):
    """LN + attention module + residual in one kernel: the input is the
    PRE-LayerNorm residual stream; the kernel normalizes in fp32 in VMEM,
    runs the shared attention body, and adds the residual back — the two
    bandwidth-bound [B, T, D] passes (standalone LN, residual add) never
    touch HBM (chip-measured -12%/-6.5%/-4.6% per module at b8/b32/b128,
    ``benchmarks/pallas_attn_lnres_probe.py``)."""
    d = x_ref.shape[-1]
    xin = x_ref[:].reshape(nb * t, d)
    xf = xin.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
    xn = xn * g_ref[:] + be_ref[:]
    out = _fold_attn_body(xn.astype(xin.dtype), cos_ref, sin_ref, r_ref,
                          wq_ref, wk_ref, wv_ref, wo_ref, bq_ref, bk_ref,
                          bv_ref, bo_ref, mask_ref, t, nb, n_heads)
    # residual add in the COMPUTE dtype (bf16 at inference), exactly as
    # the composed path adds it — keeps the fold in the same numerics
    # class as the module-only fold instead of introducing a (more
    # accurate but different) fp32 accumulation point
    att = out.reshape(nb, t, d).astype(o_ref.dtype)
    o_ref[:] = att + x_ref[:]


def _folded_rotary_pallas(x, cos_w, sin_w, r, wq, wk, wv, wo,
                          bq, bk, bv, bo, valid, nb, n_heads, interpret):
    b, t, d = x.shape
    while b % nb:       # under a mesh the LOCAL batch may not divide nb
        nb //= 2
    mask8 = valid.astype(jnp.int8)[:, None, :]
    kernel = functools.partial(_fold_rotary_kernel, t=t, nb=nb,
                               n_heads=n_heads)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)
    rows = pl.BlockSpec((nb, t, d), lambda i: (i, 0, 0))
    compiler_params = None
    if _HAS_PLTPU and not interpret:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
        grid=(b // nb,),
        in_specs=[rows, full(cos_w), full(sin_w), full(r), full(wq),
                  full(wk), full(wv), full(wo), full(bq), full(bk),
                  full(bv), full(bo),
                  pl.BlockSpec((nb, 1, t), lambda i: (i, 0, 0))],
        out_specs=rows,
        compiler_params=compiler_params,
        interpret=interpret,
    )(x, cos_w, sin_w, r, wq, wk, wv, wo, bq, bk, bv, bo, mask8)


@functools.lru_cache(maxsize=None)
def _partitioned_folded_rotary(nb: int, n_heads: int, interpret: bool):
    def impl(x, cos_w, sin_w, r, wq, wk, wv, wo, bq, bk, bv, bo, valid):
        return _folded_rotary_pallas(x, cos_w, sin_w, r, wq, wk, wv, wo,
                                     bq, bk, bv, bo, valid, nb, n_heads,
                                     interpret)

    f = custom_partitioning(impl)

    def _shardings(x_sharding, mesh, arg_shapes):
        b_s = x_sharding.spec[0] if len(x_sharding.spec) > 0 else None
        x_sh = NamedSharding(mesh, PartitionSpec(b_s, None, None))
        rep = [NamedSharding(mesh, PartitionSpec(*(None,) * len(a.shape)))
               for a in arg_shapes[1:-1]]
        valid_sh = NamedSharding(mesh, PartitionSpec(b_s, None))
        return x_sh, rep, valid_sh

    def partition(mesh, arg_shapes, result_shape):
        x_sh, rep, valid_sh = _shardings(arg_shapes[0].sharding, mesh,
                                         arg_shapes)
        return mesh, impl, x_sh, (x_sh, *rep, valid_sh)

    def infer(mesh, arg_shapes, result_shape):
        b_s = (arg_shapes[0].sharding.spec[0]
               if len(arg_shapes[0].sharding.spec) > 0 else None)
        return NamedSharding(mesh, PartitionSpec(b_s, None, None))

    f.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=("b t d, t e, t2 e2, r1 r2, w1 w2, w3 w4, w5 w6, "
                       "w7 w8, c1 c2, c3 c4, c5 c6, c7 c8, b t "
                       "-> b t d"),
        need_replication_factors=("t", "d", "e", "t2", "e2", "r1", "r2",
                                  "w1", "w2", "w3", "w4", "w5", "w6",
                                  "w7", "w8", "c1", "c2", "c3", "c4",
                                  "c5", "c6", "c7", "c8"),
    )
    return f


def folded_rotary_attention(
    params,
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    valid: jnp.ndarray,
    n_heads: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Whole rotary attention module in one Pallas kernel (inference fwd).

    Same signature semantics as ``ops/attention.py::rotary_mha``: x is the
    post-LayerNorm input [B, T, D]; cos/sin [T, d_head]; valid [B, T].
    Numerics match the composed path to bf16 tolerance (same math,
    different blocking; pinned by ``tests/test_pallas_attention.py``).
    Padded query rows are garbage by the same contract as ``fused_mha``.

    Inference-only by design: the encoder gates this on ``not train`` and
    the composed path (with its dedicated Pallas backward) keeps serving
    training.
    """
    b, t, d = x.shape
    dh = d // n_heads
    scale = 1.0 / math.sqrt(dh)
    dt = x.dtype
    cos_w = jnp.tile(cos.astype(jnp.float32), (1, n_heads))
    sin_w = jnp.tile(sin.astype(jnp.float32), (1, n_heads))
    r = jnp.asarray(_rope_perm_matrix(n_heads, dh), dt)
    wq = (params["linear_q"]["w"] * scale).astype(dt)   # scale folded in
    wk = params["linear_k"]["w"].astype(dt)
    wv = params["linear_v"]["w"].astype(dt)
    wo = params["linear_out"]["w"].astype(dt)
    f32 = jnp.float32
    bq = (params["linear_q"]["b"] * scale).astype(f32)[None, :]
    bk = params["linear_k"]["b"].astype(f32)[None, :]
    bv = params["linear_v"]["b"].astype(f32)[None, :]
    bo = params["linear_out"]["b"].astype(f32)[None, :]

    # nb (rows per cell) heuristic, chip-measured: 1 wins at T'<=512,
    # 4 wins at T'~750 (benchmarks/pallas_attn_fold_probe.py)
    if t < 640:
        nb = 1
    else:
        nb = 4 if b % 4 == 0 else (2 if b % 2 == 0 else 1)
    return _partitioned_folded_rotary(nb, n_heads, interpret)(
        x, cos_w, sin_w, r, wq, wk, wv, wo, bq, bk, bv, bo, valid)


def _folded_lnres_pallas(x, g, be, cos_w, sin_w, r, wq, wk, wv, wo,
                         bq, bk, bv, bo, valid, nb, n_heads, interpret):
    b, t, d = x.shape
    while b % nb:       # under a mesh the LOCAL batch may not divide nb
        nb //= 2
    mask8 = valid.astype(jnp.int8)[:, None, :]
    kernel = functools.partial(_fold_rotary_lnres_kernel, t=t, nb=nb,
                               n_heads=n_heads)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)
    rows = pl.BlockSpec((nb, t, d), lambda i: (i, 0, 0))
    compiler_params = None
    if _HAS_PLTPU and not interpret:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
        grid=(b // nb,),
        in_specs=[rows, full(g), full(be), full(cos_w), full(sin_w),
                  full(r), full(wq), full(wk), full(wv), full(wo),
                  full(bq), full(bk), full(bv), full(bo),
                  pl.BlockSpec((nb, 1, t), lambda i: (i, 0, 0))],
        out_specs=rows,
        compiler_params=compiler_params,
        interpret=interpret,
    )(x, g, be, cos_w, sin_w, r, wq, wk, wv, wo, bq, bk, bv, bo, mask8)


@functools.lru_cache(maxsize=None)
def _partitioned_folded_lnres(nb: int, n_heads: int, interpret: bool):
    def impl(x, g, be, cos_w, sin_w, r, wq, wk, wv, wo, bq, bk, bv, bo,
             valid):
        return _folded_lnres_pallas(x, g, be, cos_w, sin_w, r, wq, wk, wv,
                                    wo, bq, bk, bv, bo, valid, nb, n_heads,
                                    interpret)

    f = custom_partitioning(impl)

    def _shardings(x_sharding, mesh, arg_shapes):
        b_s = x_sharding.spec[0] if len(x_sharding.spec) > 0 else None
        x_sh = NamedSharding(mesh, PartitionSpec(b_s, None, None))
        rep = [NamedSharding(mesh, PartitionSpec(*(None,) * len(a.shape)))
               for a in arg_shapes[1:-1]]
        valid_sh = NamedSharding(mesh, PartitionSpec(b_s, None))
        return x_sh, rep, valid_sh

    def partition(mesh, arg_shapes, result_shape):
        x_sh, rep, valid_sh = _shardings(arg_shapes[0].sharding, mesh,
                                         arg_shapes)
        return mesh, impl, x_sh, (x_sh, *rep, valid_sh)

    def infer(mesh, arg_shapes, result_shape):
        b_s = (arg_shapes[0].sharding.spec[0]
               if len(arg_shapes[0].sharding.spec) > 0 else None)
        return NamedSharding(mesh, PartitionSpec(b_s, None, None))

    f.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=("b t d, g1 g2, g3 g4, t e, t2 e2, r1 r2, w1 w2, "
                       "w3 w4, w5 w6, w7 w8, c1 c2, c3 c4, c5 c6, c7 c8, "
                       "b t -> b t d"),
        need_replication_factors=("t", "d", "g1", "g2", "g3", "g4",
                                  "e", "t2", "e2", "r1", "r2",
                                  "w1", "w2", "w3", "w4", "w5", "w6",
                                  "w7", "w8", "c1", "c2", "c3", "c4",
                                  "c5", "c6", "c7", "c8"),
    )
    return f


def folded_rotary_attention_lnres(
    ln_params,
    params,
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    valid: jnp.ndarray,
    n_heads: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """LayerNorm + rotary attention module + residual add as ONE kernel.

    Computes ``x + attention(layer_norm(x))`` — the full attention
    sub-block of the Conformer layer — with the pre-LN residual stream as
    the only HBM input/output.  On top of :func:`folded_rotary_attention`
    this folds the two remaining bandwidth-bound [B, T, D] passes
    (standalone LN and the residual add); chip-measured per-module deltas
    -12% (b8 x 512) / -6.5% (b32 x 512) / -4.6% (b128 x 768) over the
    LN + folded + add composition (``benchmarks/pallas_attn_lnres_probe``).
    LN statistics run in fp32 (same eps=1e-5 as ``ops.conformer_ops.
    layer_norm``); the residual add runs in the compute dtype, exactly as
    the composed path adds it.  Inference-only, same contract as
    ``folded_rotary_attention``.
    """
    b, t, d = x.shape
    dh = d // n_heads
    scale = 1.0 / math.sqrt(dh)
    dt = x.dtype
    f32 = jnp.float32
    g = ln_params["scale"].astype(f32)[None, :]
    be = ln_params["bias"].astype(f32)[None, :]
    cos_w = jnp.tile(cos.astype(f32), (1, n_heads))
    sin_w = jnp.tile(sin.astype(f32), (1, n_heads))
    r = jnp.asarray(_rope_perm_matrix(n_heads, dh), dt)
    wq = (params["linear_q"]["w"] * scale).astype(dt)   # scale folded in
    wk = params["linear_k"]["w"].astype(dt)
    wv = params["linear_v"]["w"].astype(dt)
    wo = params["linear_out"]["w"].astype(dt)
    bq = (params["linear_q"]["b"] * scale).astype(f32)[None, :]
    bk = params["linear_k"]["b"].astype(f32)[None, :]
    bv = params["linear_v"]["b"].astype(f32)[None, :]
    bo = params["linear_out"]["b"].astype(f32)[None, :]

    if t < 640:
        nb = 1
    else:
        nb = 4 if b % 4 == 0 else (2 if b % 2 == 0 else 1)
    return _partitioned_folded_lnres(nb, n_heads, interpret)(
        x, g, be, cos_w, sin_w, r, wq, wk, wv, wo, bq, bk, bv, bo, valid)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, mask_ref,
                     dq_ref, dk_ref, dv_ref, *, scale: float):
    """Flash-style backward for the masked-SDPA kernel: recompute the
    probabilities in VMEM, then the standard softmax/matmul VJP — neither
    scores, probs, nor their grads ever touch HBM.  One grid cell per
    (batch*head); [T, T] fp32 intermediates bound T to ``_BWD_MAX_T``.
    """
    q = q_ref[0]                                   # [T, d]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    mask = mask_ref[0]                             # [1, T] int8

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    s = s + (mask.astype(jnp.float32) - 1.0) * (-NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    prob = p / jnp.sum(p, axis=-1, keepdims=True)  # [Tq, Tk] f32

    prob_l = prob.astype(v.dtype)
    dv = jax.lax.dot_general(
        prob_l, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # [Tk, d]
    dprob = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)        # [Tq, Tk]
    row = jnp.sum(dprob * prob, axis=-1, keepdims=True)
    ds = (prob * (dprob - row)) * scale
    ds_l = ds.astype(q.dtype)
    dq = jax.lax.dot_general(
        ds_l, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(
        ds_l, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _mha_bwd_pallas(q, k, v, do, valid, interpret):
    b, h, t, d = q.shape
    scale = 1.0 / math.sqrt(d)
    bh = b * h
    qf, kf, vf, dof = (x.reshape(bh, t, d) for x in (q, k, v, do))
    mask8 = valid.astype(jnp.int8)[:, None, :]
    kernel = functools.partial(_attn_bwd_kernel, scale=scale)
    out_sds = jax.ShapeDtypeStruct((bh, t, d), q.dtype)
    spec = pl.BlockSpec((1, t, d), lambda i: (i, 0, 0))
    dq, dk, dv = pl.pallas_call(
        kernel,
        out_shape=(out_sds, out_sds, out_sds),
        grid=(bh,),
        in_specs=[spec, spec, spec, spec,
                  pl.BlockSpec((1, 1, t), lambda i: (i // h, 0, 0))],
        out_specs=(spec, spec, spec),
        interpret=interpret,
    )(qf, kf, vf, dof, mask8)
    rs = lambda x: x.reshape(b, h, t, d)
    return rs(dq), rs(dk), rs(dv)


@functools.lru_cache(maxsize=None)
def _partitioned_mha_bwd(interpret: bool):
    def impl(q, k, v, do, valid):
        return _mha_bwd_pallas(q, k, v, do, valid, interpret)

    f = custom_partitioning(impl)

    def partition(mesh, arg_shapes, result_shape):
        q_sh = arg_shapes[0].sharding
        qkv = _bh_sharding(q_sh, mesh)
        b_s = q_sh.spec[0] if len(q_sh.spec) > 0 else None
        valid_sh = NamedSharding(mesh, PartitionSpec(b_s, None))
        return mesh, impl, (qkv, qkv, qkv), (qkv, qkv, qkv, qkv, valid_sh)

    def infer(mesh, arg_shapes, result_shape):
        sh = _bh_sharding(arg_shapes[0].sharding, mesh)
        return (sh, sh, sh)

    f.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=("b h t d, b h t d, b h t d, b h t d, b t "
                       "-> b h t d, b h t d, b h t d"),
        need_replication_factors=("t", "d"),
    )
    return f


def _xla_mha(q, k, v, valid, scale):
    """XLA twin of ``_attn_kernel`` (same masking/softmax math) — used as
    the recompute target for the custom VJP below."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    mask = valid[:, None, None, :].astype(jnp.float32)
    s = s + (mask - 1.0) * (-NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
    return (o / denom).astype(q.dtype)


def _attn_relpos_bwd_kernel(q_ref, k_ref, v_ref, qv_ref, p_ref, do_ref,
                            mask_ref, dq_ref, dk_ref, dv_ref, dqv_ref,
                            dp_ref, *, scale: float, t: int, n_bits: int):
    """Backward of ``_attn_relpos_kernel``.

    Recomputes scores (incl. the in-VMEM shear of the positional term),
    runs the softmax/matmul VJP, then *unshears* the bias gradient
    (the same log2(T)-step roll trick in the opposite direction) to get
    the gradients of the positional query and the projected position
    table.  ``dp`` is accumulated across the batch: the grid is (h, b)
    with b innermost, so all cells of one head revisit the same fp32
    output block consecutively.
    """
    ib = pl.program_id(1)
    q = q_ref[0]                                   # [T, d] (= q + bias_u)
    k = k_ref[0]
    v = v_ref[0]
    qv = qv_ref[0]                                 # [T, d] (= q + bias_v)
    p = p_ref[0]                                   # [p_pad, d]
    do = do_ref[0]
    mask = mask_ref[0]                             # [1, T] int8

    # recompute scores: content + sheared positional term (as in forward)
    raw = jax.lax.dot_general(
        qv, p, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    a = jnp.roll(raw.astype(qv.dtype), -(t - 1), axis=1)
    s_i = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
    for b in range(n_bits):
        bit = (jax.lax.shift_right_logical(s_i, b) & 1) == 1
        a = jnp.where(bit, jnp.roll(a, 1 << b, axis=1), a)
    bias = a[:, :t].astype(jnp.float32)

    s = (jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) + bias) * scale
    s = s + (mask.astype(jnp.float32) - 1.0) * (-NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    prob = e / jnp.sum(e, axis=-1, keepdims=True)

    prob_l = prob.astype(v.dtype)
    dv = jax.lax.dot_general(
        prob_l, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dprob = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    row = jnp.sum(dprob * prob, axis=-1, keepdims=True)
    dz = (prob * (dprob - row)) * scale            # grad of (qk + bias)
    dz_l = dz.astype(q.dtype)
    dq = jax.lax.dot_general(
        dz_l, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(
        dz_l, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    # unshear: d_raw[i, c] = dz[i, c - (t-1) + i] (zero outside [0, t))
    p_pad = p.shape[0]
    dzp = jnp.pad(dz_l, ((0, 0), (0, p_pad - t)))
    g = jnp.roll(dzp, t - 1, axis=1)
    for b in range(n_bits):
        bit = (jax.lax.shift_right_logical(s_i, b) & 1) == 1
        g = jnp.where(bit, jnp.roll(g, -(1 << b), axis=1), g)
    dqv = jax.lax.dot_general(
        g, p, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp_c = jax.lax.dot_general(
        g, qv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # [p_pad, d]

    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)
    dqv_ref[0] = dqv.astype(dqv_ref.dtype)

    @pl.when(ib == 0)
    def _init():
        dp_ref[0] = dp_c

    @pl.when(ib > 0)
    def _acc():
        dp_ref[0] += dp_c


def _relpos_bwd_pallas(q_u, k, v, q_v, p_heads, do, valid, interpret):
    b, h, t, d = q_u.shape
    scale = 1.0 / math.sqrt(d)
    bh = b * h
    p_len = p_heads.shape[1]
    p_pad, n_bits = _relpos_geometry(t)
    pp = jnp.pad(p_heads, ((0, 0), (0, p_pad - p_len), (0, 0)))
    qf, kf, vf, qvf, dof = (x.reshape(bh, t, d)
                            for x in (q_u, k, v, q_v, do))
    mask8 = valid.astype(jnp.int8)[:, None, :]
    kernel = functools.partial(_attn_relpos_bwd_kernel, scale=scale, t=t,
                               n_bits=n_bits)
    sds = jax.ShapeDtypeStruct((bh, t, d), q_u.dtype)
    # grid (h, b): b is the innermost grid dim, so per-head dp blocks are
    # revisited consecutively and accumulate in VMEM
    spec = pl.BlockSpec((1, t, d), lambda ih, ib: (ib * h + ih, 0, 0))
    dq, dk, dv, dqv, dp = pl.pallas_call(
        kernel,
        out_shape=(sds, sds, sds, sds,
                   jax.ShapeDtypeStruct((h, p_pad, d), jnp.float32)),
        grid=(h, b),
        in_specs=[spec, spec, spec, spec,
                  pl.BlockSpec((1, p_pad, d), lambda ih, ib: (ih, 0, 0)),
                  spec,
                  pl.BlockSpec((1, 1, t), lambda ih, ib: (ib, 0, 0))],
        out_specs=(spec, spec, spec, spec,
                   pl.BlockSpec((1, p_pad, d), lambda ih, ib: (ih, 0, 0))),
        interpret=interpret,
    )(qf, kf, vf, qvf, pp, dof, mask8)
    rs = lambda x: x.reshape(b, h, t, d)
    return (rs(dq), rs(dk), rs(dv), rs(dqv),
            dp[:, :p_len].astype(p_heads.dtype))


@functools.lru_cache(maxsize=None)
def _partitioned_relpos_bwd(interpret: bool):
    def impl(q_u, k, v, q_v, p_heads, do, valid):
        return _relpos_bwd_pallas(q_u, k, v, q_v, p_heads, do, valid,
                                  interpret)

    f = custom_partitioning(impl)

    def partition(mesh, arg_shapes, result_shape):
        q_sh = arg_shapes[0].sharding
        qkv = _bh_sharding(q_sh, mesh)
        spec = q_sh.spec
        b_s = spec[0] if len(spec) > 0 else None
        h_s = spec[1] if len(spec) > 1 else None
        p_sh = NamedSharding(mesh, PartitionSpec(h_s, None, None))
        valid_sh = NamedSharding(mesh, PartitionSpec(b_s, None))
        # dp sums over the batch — when b is sharded, each shard holds a
        # partial sum that must be all-reduced over the batch mesh axes
        b_axes = ((b_s,) if isinstance(b_s, str) else tuple(b_s or ()))

        def lower_fn(q_u, k, v, q_v, p_heads, do, valid):
            dq, dk, dv, dqv, dp = impl(q_u, k, v, q_v, p_heads, do, valid)
            if b_axes:
                dp = jax.lax.psum(dp, b_axes)
            return dq, dk, dv, dqv, dp

        return (mesh, lower_fn, (qkv, qkv, qkv, qkv, p_sh),
                (qkv, qkv, qkv, qkv, p_sh, qkv, valid_sh))

    def infer(mesh, arg_shapes, result_shape):
        q_sh = arg_shapes[0].sharding
        qkv = _bh_sharding(q_sh, mesh)
        h_s = q_sh.spec[1] if len(q_sh.spec) > 1 else None
        p_sh = NamedSharding(mesh, PartitionSpec(h_s, None, None))
        return (qkv, qkv, qkv, qkv, p_sh)

    f.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=("b h t d, b h t d, b h t d, b h t d, h p d, "
                       "b h t d, b t -> b h t d, b h t d, b h t d, "
                       "b h t d, h p d"),
        need_replication_factors=("t", "d", "p"),
        reduction_factors=("b",),
    )
    return f


def _xla_relpos(q_u, k, v, q_v, p_heads, valid, scale):
    """XLA twin of ``_attn_relpos_kernel`` — VJP recompute target.

    Same math as the kernel (rel_shift via pad/reshape instead of shear);
    p_heads [H, P, d] with P = 2T - 1.
    """
    t = q_u.shape[2]
    ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k,
                    preferred_element_type=jnp.float32)
    bd = jnp.einsum("bhqd,hpd->bhqp", q_v, p_heads,
                    preferred_element_type=jnp.float32)
    b, h, tt, pdim = bd.shape
    bd = jnp.pad(bd, ((0, 0), (0, 0), (0, 0), (1, 0)))
    bd = bd.reshape(b, h, pdim + 1, tt)[:, :, 1:].reshape(b, h, tt, pdim)
    s = (ac + bd[..., :t]) * scale
    mask = valid[:, None, None, :].astype(jnp.float32)
    s = s + (mask - 1.0) * (-NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    pr = jnp.exp(s - m)
    denom = jnp.sum(pr, axis=-1, keepdims=True)
    o = jnp.einsum("bhqk,bhkd->bhqd", pr.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
    return (o / denom).astype(q_u.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _fused_mha(q, k, v, valid, block_q, interpret):
    return _fused_mha_fwd_only(q, k, v, valid, block_q, interpret)


def _fused_mha_vjp_fwd(q, k, v, valid, block_q, interpret):
    out = _fused_mha_fwd_only(q, k, v, valid, block_q, interpret)
    return out, (q, k, v, valid)


def _fused_mha_vjp_bwd(block_q, interpret, res, g):
    q, k, v, valid = res
    t = q.shape[2]
    if t <= _BWD_MAX_T and (interpret or fused_attention_available(t)):
        # flash-style Pallas backward: recompute probs in VMEM, full VJP
        # on-chip (scores/probs/grads never reach HBM)
        dq, dk, dv = _partitioned_mha_bwd(interpret)(q, k, v, g, valid)
        return dq, dk, dv, None
    # fallback: differentiate the mathematically identical XLA attention
    scale = 1.0 / math.sqrt(q.shape[-1])
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_mha(q_, k_, v_, valid, scale),
                     q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_fused_mha.defvjp(_fused_mha_vjp_fwd, _fused_mha_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _fused_relpos(q_u, k, v, q_v, p_heads, valid, block_q, interpret):
    return _fused_relpos_fwd_only(q_u, k, v, q_v, p_heads, valid, block_q,
                                  interpret)


def _fused_relpos_vjp_fwd(q_u, k, v, q_v, p_heads, valid, block_q, interpret):
    out = _fused_relpos_fwd_only(q_u, k, v, q_v, p_heads, valid, block_q,
                                 interpret)
    return out, (q_u, k, v, q_v, p_heads, valid)


def _fused_relpos_vjp_bwd(block_q, interpret, res, g):
    q_u, k, v, q_v, p_heads, valid = res
    t = q_u.shape[2]
    if t <= _BWD_MAX_T and (interpret
                            or fused_attention_available(t, "relpos")):
        # Pallas backward with in-VMEM shear/unshear — the XLA fallback's
        # rel_shift relayouts cost ~2x the whole v3 train step (PERF.md)
        dq_u, dk, dv, dq_v, dp = _partitioned_relpos_bwd(interpret)(
            q_u, k, v, q_v, p_heads, g, valid)
        return dq_u, dk, dv, dq_v, dp, None
    scale = 1.0 / math.sqrt(q_u.shape[-1])
    _, vjp = jax.vjp(
        lambda a, b, c, d, e: _xla_relpos(a, b, c, d, e, valid, scale),
        q_u, k, v, q_v, p_heads)
    dq_u, dk, dv, dq_v, dp = vjp(g)
    return dq_u, dk, dv, dq_v, dp, None


_fused_relpos.defvjp(_fused_relpos_vjp_fwd, _fused_relpos_vjp_bwd)


def fused_mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    valid: jnp.ndarray,
    block_q: int = 768,
    interpret: bool = False,
) -> jnp.ndarray:
    """Masked SDPA. q/k/v [B, H, T, d]; valid [B, T] bool -> [B, H, T, d].

    ``block_q``: the kernel is cell-latency-bound, not softmax- or
    MXU-bound (an all-heads-per-cell variant measured *zero* further
    gain), so fewer/bigger q-blocks win: 512 was ~10% over 256 at T'=501,
    and 768 is a further 9% over the balanced 2x384 split at T'=750
    (b128, chip-measured round 4: 6.67 vs 7.32 ms for the kernel core) —
    one block per (batch, head) for every shape the 25/30 s caps produce.
    VMEM stays comfortable: the [block_q, T] fp32 score block is 6.3 MB
    at the T=2048 fallback bound.

    Differentiable: forward runs the Pallas kernel; backward recomputes
    through an identical XLA formulation (``_xla_mha``), so the op works
    under ``jax.grad`` / ``jax.checkpoint`` in the train step.

    Output rows for invalid (padded) query positions are garbage, matching
    the XLA path's contract: the Conformer conv module re-zeroes padding
    before any cross-time mixing (``gigaam/encoder.py:396-409``).
    """
    return _fused_mha(q, k, v, valid, block_q, interpret)


def fused_relpos_mha(
    q_u: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_v: jnp.ndarray,
    p_heads: jnp.ndarray,
    valid: jnp.ndarray,
    block_q: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused Transformer-XL rel-pos SDPA (v1/v2 encoder generations).

    q_u/k/v/q_v [B, H, T, d] (q_u = q + pos_bias_u, q_v = q + pos_bias_v);
    p_heads [H, 2T-1, d] per-head projected position table (positions
    T-1 .. -(T-1)); valid [B, T] bool.  Same padded-row-garbage contract
    and differentiability story as ``fused_mha`` (backward recomputes
    through ``_xla_relpos``).
    """
    return _fused_relpos(q_u, k, v, q_v, p_heads, valid, block_q, interpret)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def _fused_relpos_fwd_only(
    q_u: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_v: jnp.ndarray,
    p_heads: jnp.ndarray,
    valid: jnp.ndarray,
    block_q: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    return _partitioned_relpos(block_q, interpret)(q_u, k, v, q_v, p_heads,
                                                   valid)


def _relpos_pallas(
    q_u: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_v: jnp.ndarray,
    p_heads: jnp.ndarray,
    valid: jnp.ndarray,
    block_q: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    b, h, t, d = q_u.shape
    block_q = _balanced_block_q(t, block_q)
    scale = 1.0 / math.sqrt(d)
    bh = b * h
    p_pad, n_bits = _relpos_geometry(t)
    pp = jnp.pad(p_heads, ((0, 0), (0, p_pad - p_heads.shape[1]), (0, 0)))
    qf = q_u.reshape(bh, t, d)
    kf = k.reshape(bh, t, d)
    vf = v.reshape(bh, t, d)
    qvf = q_v.reshape(bh, t, d)
    mask8 = valid.astype(jnp.int8)[:, None, :]

    n_q = pl.cdiv(t, block_q)
    grid = (bh, n_q)
    kernel = functools.partial(_attn_relpos_kernel, scale=scale, t=t,
                               blk_q=block_q, n_bits=n_bits)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, t, d), q_u.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, p_pad, d), lambda i, j: (i % h, 0, 0)),
            pl.BlockSpec((1, 1, t), lambda i, j: (i // h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        interpret=interpret,
    )(qf, kf, vf, qvf, pp, mask8)
    return out.reshape(b, h, t, d)


# ---------------------------------------------------------------------------
# SPMD partitioning
#
# Under pjit over a multi-device Mesh, a bare pallas_call has no partitioning
# rule: the SPMD partitioner all-gathers its operands and replicates the
# kernel on every device — a silent scaling cliff for data-parallel inference
# and mesh-sharded training (verified on an 8-device host mesh: output came
# back with an empty PartitionSpec).  custom_partitioning teaches XLA that
# the kernels are elementwise in (batch, head) and need (t, d) — and p for
# rel-pos — replicated, so batch-DP and head-TP shard cleanly with no
# collectives around the kernel.
# ---------------------------------------------------------------------------


def _bh_sharding(sharding, mesh, rank_tail: int = 2):
    """Keep the (b, h) axis specs of ``sharding``, replicate the rest."""
    spec = sharding.spec
    b_s = spec[0] if len(spec) > 0 else None
    h_s = spec[1] if len(spec) > 1 else None
    return NamedSharding(mesh, PartitionSpec(b_s, h_s, *(None,) * rank_tail))


@functools.lru_cache(maxsize=None)
def _partitioned_mha(block_q: int, interpret: bool):
    def impl(q, k, v, valid):
        return _mha_pallas(q, k, v, valid, block_q, interpret)

    f = custom_partitioning(impl)

    def partition(mesh, arg_shapes, result_shape):
        q_sh = arg_shapes[0].sharding
        qkv = _bh_sharding(q_sh, mesh)
        b_s = q_sh.spec[0] if len(q_sh.spec) > 0 else None
        valid_sh = NamedSharding(mesh, PartitionSpec(b_s, None))
        return mesh, impl, qkv, (qkv, qkv, qkv, valid_sh)

    def infer(mesh, arg_shapes, result_shape):
        return _bh_sharding(arg_shapes[0].sharding, mesh)

    f.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule="b h t d, b h t d, b h t d, b t -> b h t d",
        need_replication_factors=("t", "d"),
    )
    return f


@functools.lru_cache(maxsize=None)
def _partitioned_relpos(block_q: int, interpret: bool):
    def impl(q_u, k, v, q_v, p_heads, valid):
        return _relpos_pallas(q_u, k, v, q_v, p_heads, valid, block_q,
                              interpret)

    f = custom_partitioning(impl)

    def partition(mesh, arg_shapes, result_shape):
        q_sh = arg_shapes[0].sharding
        qkv = _bh_sharding(q_sh, mesh)
        spec = q_sh.spec
        b_s = spec[0] if len(spec) > 0 else None
        h_s = spec[1] if len(spec) > 1 else None
        p_sh = NamedSharding(mesh, PartitionSpec(h_s, None, None))
        valid_sh = NamedSharding(mesh, PartitionSpec(b_s, None))
        return mesh, impl, qkv, (qkv, qkv, qkv, qkv, p_sh, valid_sh)

    def infer(mesh, arg_shapes, result_shape):
        return _bh_sharding(arg_shapes[0].sharding, mesh)

    f.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=("b h t d, b h t d, b h t d, b h t d, h p d, b t "
                       "-> b h t d"),
        need_replication_factors=("t", "d", "p"),
    )
    return f


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def _fused_mha_fwd_only(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    valid: jnp.ndarray,
    block_q: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    return _partitioned_mha(block_q, interpret)(q, k, v, valid)


def _mha_pallas(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    valid: jnp.ndarray,
    block_q: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    b, h, t, d = q.shape
    block_q = _balanced_block_q(t, block_q)
    scale = 1.0 / math.sqrt(d)
    bh = b * h
    qf = q.reshape(bh, t, d)
    kf = k.reshape(bh, t, d)
    vf = v.reshape(bh, t, d)
    # [B, 1, T]: TPU block shapes need the sublane dim to match the array
    mask8 = valid.astype(jnp.int8)[:, None, :]

    n_q = pl.cdiv(t, block_q)
    grid = (bh, n_q)
    kernel = functools.partial(_attn_kernel, scale=scale)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, t, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, t), lambda i, j: (i // h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        interpret=interpret,
    )(qf, kf, vf, mask8)
    return out.reshape(b, h, t, d)
