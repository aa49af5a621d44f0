"""Conformer building blocks: LayerNorm/BatchNorm, FFN, conv module,
striding subsampling.

TPU-first re-designs of ``gigaam/encoder.py:32-130,364-424``:
* pointwise Conv1d(k=1) layers become plain matmuls (MXU),
* the depthwise conv is ``lax.conv_general_dilated`` with
  ``feature_group_count=d_model`` in NWC layout,
* subsampling convs run in NHWC with per-stage tail re-masking — the
  batch-invariance-critical step documented at ``gigaam/encoder.py:92-109``.

Weights layout (converter maps from torch):
* Linear: w [in, out], b [out]
* Conv1d depthwise: w [K, 1, C] (torch [C, 1, K])
* Conv2d: w [Kh, Kw, Cin, Cout] (torch [Cout, Cin, Kh, Kw])
* Conv1d (subsampling conv1d variant): w [K, Cin, Cout] (torch [Cout, Cin, K])
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def linear(p: Dict[str, jnp.ndarray], x: jnp.ndarray) -> jnp.ndarray:
    y = jnp.einsum("...i,io->...o", x, p["w"].astype(x.dtype),
                   preferred_element_type=x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def layer_norm(p: Dict[str, jnp.ndarray], x: jnp.ndarray,
               eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm over the last dim; statistics in fp32."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def batch_norm_infer(p: Dict[str, jnp.ndarray], x: jnp.ndarray,
                     eps: float = 1e-5) -> jnp.ndarray:
    """Inference BatchNorm over channel (last) dim using running stats."""
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    scale = (p["scale"].astype(jnp.float32) * inv).astype(x.dtype)
    bias = (p["bias"].astype(jnp.float32)
            - p["mean"].astype(jnp.float32) * p["scale"].astype(jnp.float32) * inv
            ).astype(x.dtype)
    return x * scale + bias


def batch_norm_train(
    p: Dict[str, jnp.ndarray], x: jnp.ndarray, eps: float = 1e-5,
    momentum: float = 0.1, axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Training BatchNorm over (batch, time) for x [B, T, C].

    Mirrors torch BatchNorm1d semantics (stats over all positions including
    zeroed padding, as the reference does in train mode) and returns updated
    running stats.  If ``axis_name`` is set, batch statistics are psum'd
    across the data-parallel mesh axis (a sync-BN upgrade over the
    reference's per-replica DDP BN).
    """
    xf = x.astype(jnp.float32)
    n = x.shape[0] * x.shape[1]
    if axis_name is not None:
        # global moments from psum'd first/second raw moments: a pmean of
        # per-replica variances would omit the cross-replica mean-spread
        # term and under-estimate the true variance
        mean = jax.lax.pmean(xf.mean(axis=(0, 1)), axis_name)
        sq = jax.lax.pmean((xf * xf).mean(axis=(0, 1)), axis_name)
        var = sq - mean * mean
        n = n * jax.lax.psum(1, axis_name)
    else:
        mean = xf.mean(axis=(0, 1))
        var = ((xf - mean) ** 2).mean(axis=(0, 1))
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    unbiased = var * n / jnp.maximum(n - 1, 1)
    new_stats = {
        "mean": (1 - momentum) * p["mean"] + momentum * mean,
        "var": (1 - momentum) * p["var"] + momentum * unbiased,
    }
    return y.astype(x.dtype), new_stats


def ffn(p: Dict[str, Dict[str, jnp.ndarray]], x: jnp.ndarray) -> jnp.ndarray:
    """Linear -> SiLU -> Linear (``gigaam/encoder.py:412-424``)."""
    return linear(p["linear2"], jax.nn.silu(linear(p["linear1"], x)))


def depthwise_conv1d(w: jnp.ndarray, b: Optional[jnp.ndarray],
                     x: jnp.ndarray) -> jnp.ndarray:
    """Depthwise conv over time. x [B, T, C]; w [K, 1, C]; 'same' padding."""
    k = w.shape[0]
    pad = (k - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(1,),
        padding=((pad, pad),),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=x.shape[-1],
    )
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def conformer_conv(
    p: Dict[str, Dict[str, jnp.ndarray]],
    x: jnp.ndarray,
    valid: Optional[jnp.ndarray],
    norm_type: str,
    train: bool = False,
    bn_axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, Optional[Dict[str, jnp.ndarray]]]:
    """Conformer convolution module (``gigaam/encoder.py:364-409``).

    pointwise(2C) -> GLU -> zero padded tail -> depthwise(k=31) -> BN/LN ->
    SiLU -> pointwise.  x [B, T, C]; valid [B, T] True=real frame.
    Returns (y, new_bn_stats_or_None).
    """
    # GLU with the value/gate projections as separate leaves (torch fuses
    # them into one [d, 2C] matmul + split at dim=1): numerically identical,
    # but under tensor parallelism each half shards over "model" so
    # (a_i, g_i) stay co-resident — the fused layout forces a full
    # activation exchange before the product (see docs/PERF.md)
    pc1 = p["pointwise_conv1"]

    def _half(which: str) -> Dict[str, jnp.ndarray]:
        h = {"w": pc1[f"w_{which}"]}
        if f"b_{which}" in pc1:
            h["b"] = pc1[f"b_{which}"]
        return h

    a = linear(_half("value"), x)
    g = linear(_half("gate"), x)
    y = a * jax.nn.sigmoid(g)                            # GLU (torch dim=1)
    if valid is not None:
        y = jnp.where(valid[:, :, None], y, 0.0)
    y = depthwise_conv1d(p["depthwise_conv"]["w"],
                         p["depthwise_conv"].get("b"), y)
    new_stats = None
    if norm_type == "batch_norm":
        if train:
            y, new_stats = batch_norm_train(p["batch_norm"], y,
                                            axis_name=bn_axis_name)
        else:
            y = batch_norm_infer(p["batch_norm"], y)
    else:
        y = layer_norm(p["batch_norm"], y)
    y = jax.nn.silu(y)
    return linear(p["pointwise_conv2"], y), new_stats


# ---------------------------------------------------------------------------
# Striding subsampling (``gigaam/encoder.py:32-130``)
# ---------------------------------------------------------------------------

def subsampled_length(lengths: jnp.ndarray, num_stages: int,
                      kernel_size: int = 3, stride: int = 2) -> jnp.ndarray:
    """Valid length after strided conv stages (``gigaam/encoder.py:77-90``)."""
    pad = (kernel_size - 1) // 2
    add_pad = 2 * pad - kernel_size
    out = lengths.astype(jnp.float32)
    for _ in range(num_stages):
        out = jnp.floor((out + add_pad) / stride + 1.0)
    return out.astype(jnp.int32)


def static_subsampled_length(t_feat: int, num_stages: int,
                             kernel_size: int = 3, stride: int = 2) -> int:
    """Pure-Python twin of ``subsampled_length`` for *static* shapes.

    Needed by callers inside jit traces (where jnp constants become
    tracers) to size positional tables; keeping the single mirror here
    prevents the two arithmetic copies from drifting.
    """
    import math

    pad = (kernel_size - 1) // 2
    add_pad = 2 * pad - kernel_size
    out = float(t_feat)
    for _ in range(num_stages):
        out = math.floor((out + add_pad) / stride + 1.0)
    return int(out)


def _mask_time(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Zero the padded tail along time (axis 1).

    Reproduces the batch-invariance fix of ``gigaam/encoder.py:92-109``: the
    strided convs' receptive field is wider than the stride, so without
    re-zeroing after every stage the log-mel pad floor (log 1e-9) of batched
    short samples leaks into their last valid frames.
    """
    t = x.shape[1]
    time = jnp.arange(t)[None, :]
    m = time < lengths[:, None]                          # [B, T]
    shape = (x.shape[0], t) + (1,) * (x.ndim - 2)
    return jnp.where(m.reshape(shape), x, 0.0)


def striding_subsampling_conv2d(
    p: Dict[str, Dict[str, jnp.ndarray]],
    feats: jnp.ndarray,
    lengths: jnp.ndarray,
    num_stages: int,
    kernel_size: int = 3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """conv2d subsampling: feats [B, T, F] -> [B, T', d_model].

    Stage convs stride 2 over (time, freq) with ReLU; the channelxfreq block
    flattens (channel-major, matching torch's [b, t, C, f] reshape at
    ``gigaam/encoder.py:125-127``) through a Linear.
    """
    pad = (kernel_size - 1) // 2
    x = feats[..., None]                                 # [B, T, F, 1] NHWC
    cur_len = lengths
    x = _mask_time(x, cur_len)
    for i in range(num_stages):
        w = p[f"conv_{i}"]["w"].astype(x.dtype)          # [Kh, Kw, Cin, Cout]
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=(2, 2),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        x = x + p[f"conv_{i}"]["b"].astype(x.dtype)
        x = jax.nn.relu(x)
        cur_len = subsampled_length(cur_len, 1, kernel_size)
        x = _mask_time(x, cur_len)
    b, t, f, c = x.shape
    # The reference flattens channel-major ([b, t, C, f] reshape at
    # ``gigaam/encoder.py:125-127``), which from NHWC needs a transpose of
    # the ACTIVATION ([B, T2, F2, C] -> [B, T2, C, F2]: 98 MB at b8 x 20 s,
    # ~210 us chip-measured; 4x that at b32).  Transposing the WEIGHT to
    # freq-major instead is numerically the same contraction and touches
    # only [C*F, d] = 18 MB bf16, constant in batch.
    w = p["out"]["w"].astype(x.dtype)                    # [C*F, d] c-major
    w = w.reshape(c, f, -1).transpose(1, 0, 2).reshape(f * c, -1)
    out = jnp.einsum("...i,io->...o", x.reshape(b, t, f * c), w,
                     preferred_element_type=x.dtype)
    if "b" in p["out"]:
        out = out + p["out"]["b"].astype(x.dtype)
    # cur_len IS subsampled_length(lengths, num_stages): return the value
    # the masks used, so masking and reported lengths cannot drift apart
    return out, cur_len


def striding_subsampling_conv1d(
    p: Dict[str, Dict[str, jnp.ndarray]],
    feats: jnp.ndarray,
    lengths: jnp.ndarray,
    num_stages: int,
    kernel_size: int = 3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """conv1d subsampling variant: feats [B, T, F] -> [B, T', d_model]."""
    pad = (kernel_size - 1) // 2
    x = feats                                            # [B, T, F] NWC
    cur_len = lengths
    x = _mask_time(x, cur_len)
    for i in range(num_stages):
        w = p[f"conv_{i}"]["w"].astype(x.dtype)          # [K, Cin, Cout]
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=(2,), padding=((pad, pad),),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        x = x + p[f"conv_{i}"]["b"].astype(x.dtype)
        x = jax.nn.relu(x)
        cur_len = subsampled_length(cur_len, 1, kernel_size)
        x = _mask_time(x, cur_len)
    return x, cur_len
