"""Conformer encoder: functional params + forward.

Re-architecture of ``gigaam/encoder.py:427-647`` for JAX/XLA:

* Params are a pytree of stacked per-layer arrays (leading axis = layer) and
  the 16 Conformer layers run under ``lax.scan`` — one compiled layer body
  instead of 16 unrolled copies, which cuts compile time and lets
  ``jax.checkpoint`` (activation checkpointing, reference
  ``encoder.py:628-638``) apply per scan step.
* Macaron structure per layer (``encoder.py:473-498``):
  x + 0.5*FFN -> +MHSA -> +Conv -> +0.5*FFN -> LN, fc_factor=0.5.
* Masks: boolean valid [B, T'] built from subsampled lengths; attention
  masking is always applied (the reference skips it for B==1 because
  unbatched inputs are never padded, ``encoder.py:620-624``; we pad to
  buckets, so masking must be unconditional).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EncoderConfig
from ..ops.attention import relpos_mha, rotary_mha
from ..ops.conformer_ops import (
    conformer_conv,
    ffn,
    layer_norm,
    striding_subsampling_conv1d,
    striding_subsampling_conv2d,
    subsampled_length,
)
from ..ops.rotary import rotary_tables

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Positional tables (host-side)
# ---------------------------------------------------------------------------

def relpos_table(length: int, dim: int) -> np.ndarray:
    """Sinusoidal relative-position table [2L-1, dim]; index i holds
    position L-1-i (reference ``gigaam/encoder.py:312-327``)."""
    positions = np.arange(length - 1, -length, -1, dtype=np.float64)[:, None]
    pe = np.zeros((2 * length - 1, dim), dtype=np.float64)
    div_term = np.exp(np.arange(0, dim, 2, dtype=np.float64)
                      * -(math.log(10000.0) / dim))
    pe[:, 0::2] = np.sin(positions * div_term)
    pe[:, 1::2] = np.cos(positions * div_term)
    return pe.astype(np.float32)


class PosTables:
    """Lazily-extended positional tables (mirror of ``extend_pe``)."""

    def __init__(self, cfg: EncoderConfig):
        self.cfg = cfg
        # (length, rotary_tables | None, relpos_table | None): swapped as ONE
        # tuple so concurrent readers never see a length/table mismatch
        self._state: Tuple[int, Optional[Tuple[np.ndarray, np.ndarray]],
                           Optional[np.ndarray]] = (0, None, None)
        import threading

        # serializes growth: without it two concurrent ensure() calls can
        # install tables out of order and SHRINK the state (a reader's
        # cos[:t] would then silently truncate)
        self._grow_lock = threading.Lock()
        # device-array cache per t: lengths are bucketed, so a handful of
        # entries ends the per-call host->device re-upload of MB-sized
        # tables on the serving hot path
        self._dev: dict = {}

    @property
    def _len(self) -> int:
        return self._state[0]

    def ensure(self, length: int) -> None:
        length = max(length, self.cfg.pos_emb_max_len)
        if length <= self._state[0]:
            return
        with self._grow_lock:
            if length <= self._state[0]:  # another thread grew it first
                return
            if self.cfg.self_attention_model == "rotary":
                self._state = (length,
                               rotary_tables(length, self.cfg.d_head,
                                             self.cfg.pos_emb_max_len),
                               None)
            else:
                self._state = (length, None,
                               relpos_table(length, self.cfg.d_model))
            self._dev.clear()

    @staticmethod
    def _cacheable(val) -> bool:
        # inside a jit trace jnp.asarray stages the constant as a tracer —
        # caching that would leak it into later traces
        return not any(isinstance(v, jax.core.Tracer)
                       for v in jax.tree.leaves(val))

    # NOTE: serving threads share these caches without a lock; ``ensure``
    # can clear ``_dev`` concurrently with another thread's lookup, so the
    # getters return the locally-built value instead of re-reading the dict
    # (a stale entry is harmless; a re-read after a clear would KeyError).

    def rotary(self, t: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        self.ensure(t)
        cached = self._dev.get(t)
        if cached is not None:
            return cached
        _, rot, _ = self._state          # one snapshot: len+table consistent
        cos, sin = rot
        val = (jnp.asarray(cos[:t]), jnp.asarray(sin[:t]))
        if self._cacheable(val):
            self._dev[t] = val
        return val

    def relpos(self, t: int) -> jnp.ndarray:
        self.ensure(t)
        cached = self._dev.get(t)
        if cached is not None:
            return cached
        center, _, rel = self._state     # one snapshot: len+table consistent
        val = jnp.asarray(rel[center - t: center + t - 1])
        if self._cacheable(val):
            self._dev[t] = val
        return val


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def _init_linear(key, d_in, d_out, bias=True):
    k1, k2 = jax.random.split(key)
    bound = 1.0 / math.sqrt(d_in)
    p = {"w": _uniform(k1, (d_in, d_out), bound)}
    if bias:
        p["b"] = _uniform(k2, (d_out,), bound)
    return p


def _init_norm(dim):
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def _init_attention(key, cfg: EncoderConfig):
    keys = jax.random.split(key, 5)
    d = cfg.d_model
    p = {
        "linear_q": _init_linear(keys[0], d, d),
        "linear_k": _init_linear(keys[1], d, d),
        "linear_v": _init_linear(keys[2], d, d),
        "linear_out": _init_linear(keys[3], d, d),
    }
    if cfg.self_attention_model == "rel_pos":
        p["linear_pos"] = _init_linear(keys[4], d, d, bias=False)
        p["pos_bias_u"] = jnp.zeros((cfg.n_heads, cfg.d_head), jnp.float32)
        p["pos_bias_v"] = jnp.zeros((cfg.n_heads, cfg.d_head), jnp.float32)
    return p


def _init_conv_module(key, cfg: EncoderConfig):
    keys = jax.random.split(key, 3)
    d = cfg.d_model
    k = cfg.conv_kernel_size
    dw_bound = 1.0 / math.sqrt(k)  # torch conv bound: 1/sqrt(fan_in), fan_in=k*1
    kb1, kb2 = jax.random.split(keys[1])
    # the GLU projection's value/gate halves are separate leaves: a fused
    # [d, 2d] weight sharded over "model" puts all of `a` on one device
    # group and all of `g` on another, forcing GSPMD to exchange the full
    # activation before a*sigmoid(g) (verified: 6 collective-permutes per
    # module); split leaves shard Megatron-GLU style with none.  Init stays
    # bit-identical to the fused form: one draw, then split.
    pc1 = _init_linear(keys[0], d, 2 * d)
    p = {
        "pointwise_conv1": {
            "w_value": pc1["w"][:, :d], "w_gate": pc1["w"][:, d:],
            "b_value": pc1["b"][:d], "b_gate": pc1["b"][d:],
        },
        "depthwise_conv": {
            "w": _uniform(kb1, (k, 1, d), dw_bound),
            "b": _uniform(kb2, (d,), dw_bound),
        },
        "pointwise_conv2": _init_linear(keys[2], d, d),
        "batch_norm": _init_norm(d),
    }
    if cfg.conv_norm_type == "batch_norm":
        p["batch_norm"]["mean"] = jnp.zeros((d,), jnp.float32)
        p["batch_norm"]["var"] = jnp.ones((d,), jnp.float32)
    return p


def _init_layer(key, cfg: EncoderConfig):
    keys = jax.random.split(key, 4)
    d = cfg.d_model
    return {
        "norm_feed_forward1": _init_norm(d),
        "feed_forward1": {
            "linear1": _init_linear(jax.random.fold_in(keys[0], 0), d, cfg.d_ff),
            "linear2": _init_linear(jax.random.fold_in(keys[0], 1), cfg.d_ff, d),
        },
        "norm_self_att": _init_norm(d),
        "self_attn": _init_attention(keys[1], cfg),
        "norm_conv": _init_norm(d),
        "conv": _init_conv_module(keys[2], cfg),
        "norm_feed_forward2": _init_norm(d),
        "feed_forward2": {
            "linear1": _init_linear(jax.random.fold_in(keys[3], 0), d, cfg.d_ff),
            "linear2": _init_linear(jax.random.fold_in(keys[3], 1), cfg.d_ff, d),
        },
        "norm_out": _init_norm(d),
    }


def _init_subsampling(key, cfg: EncoderConfig):
    stages = cfg.num_subsampling_stages
    keys = jax.random.split(key, stages + 1)
    p: Params = {}
    if cfg.subsampling == "conv2d":
        in_ch = 1
        for i in range(stages):
            fan_in = in_ch * cfg.subs_kernel_size ** 2
            bound = 1.0 / math.sqrt(fan_in)
            ka, kb = jax.random.split(keys[i])
            p[f"conv_{i}"] = {
                "w": _uniform(ka, (cfg.subs_kernel_size, cfg.subs_kernel_size,
                                   in_ch, cfg.d_model), bound),
                "b": _uniform(kb, (cfg.d_model,), bound),
            }
            in_ch = cfg.d_model
        f_out = cfg.feat_in
        for _ in range(stages):
            f_out = int(np.floor((f_out - 1) / 2 + 1.0))
        p["out"] = _init_linear(keys[-1], cfg.d_model * f_out, cfg.d_model)
    else:
        in_ch = cfg.feat_in
        for i in range(stages):
            fan_in = in_ch * cfg.subs_kernel_size
            bound = 1.0 / math.sqrt(fan_in)
            ka, kb = jax.random.split(keys[i])
            p[f"conv_{i}"] = {
                "w": _uniform(ka, (cfg.subs_kernel_size, in_ch, cfg.d_model),
                              bound),
                "b": _uniform(kb, (cfg.d_model,), bound),
            }
            in_ch = cfg.d_model
    return p


def init_encoder_params(key: jax.Array, cfg: EncoderConfig) -> Params:
    """Random-init encoder params (torch-style uniform bounds).

    Per-layer params are stacked along a leading layer axis for
    ``lax.scan`` (see ``stack_layer_params``).
    """
    k_sub, k_layers = jax.random.split(key)
    layer_keys = jax.random.split(k_layers, cfg.n_layers)
    layers = [_init_layer(k, cfg) for k in layer_keys]
    return {
        "pre_encode": _init_subsampling(k_sub, cfg),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

# smallest (global) batch at which the LN+residual-folded attention kernel
# beats the module-fold + composed LN/add (chip A/B 2026-08-21: b8 +0.7%
# against, b32 -1.3% end-to-end in favor)
_LNRES_MIN_BATCH = 16


def _layer_forward(
    lp: Params,
    x: jnp.ndarray,
    pos: Any,
    valid: jnp.ndarray,
    cfg: EncoderConfig,
    train: bool,
    bn_axis_name: Optional[str],
) -> Tuple[jnp.ndarray, Optional[Params]]:
    """One Conformer layer (``gigaam/encoder.py:473-498``)."""
    residual = x
    y = ffn(lp["feed_forward1"], layer_norm(lp["norm_feed_forward1"], x))
    residual = residual + 0.5 * y

    use_fused = use_folded = False
    if cfg.flash_attn:
        from ..ops.pallas_attention import (
            folded_attention_available,
            fused_attention_available,
        )

        kind = ("sdpa" if cfg.self_attention_model == "rotary" else "relpos")
        use_fused = fused_attention_available(x.shape[1], kind)
        # inference forward: the whole attention sub-block (pre-LN -> RoPE
        # -> projections -> per-head SDPA -> out-projection -> residual
        # add) runs as ONE Pallas kernel — the module fold was -13% at b32
        # / -22% at b128 over the composed path, and folding the LN +
        # residual passes takes a further -6.5% / -4.6% per module
        # (PERF.md round 5).  Training keeps the composed path, whose
        # dedicated Pallas backward kernels carry the custom VJPs.
        use_folded = (kind == "sdpa" and not train and use_fused
                      and folded_attention_available(x.shape[1]))
    if cfg.self_attention_model == "rotary" and use_folded:
        cos, sin = pos
        # LN+residual join the fold only at serving batches: at b8 the
        # in-model A/B reads +0.7% for the lnres variant (XLA already
        # overlaps the LN/residual passes at small batch; the kernel
        # boundary serializes them), while b32 is -1.3% end-to-end in
        # its favor (PERF.md round-5 second fold)
        if x.shape[0] >= _LNRES_MIN_BATCH:
            from ..ops.pallas_attention import folded_rotary_attention_lnres

            residual = folded_rotary_attention_lnres(
                lp["norm_self_att"], lp["self_attn"], residual, cos, sin,
                valid, cfg.n_heads)
        else:
            from ..ops.pallas_attention import folded_rotary_attention

            y = layer_norm(lp["norm_self_att"], residual)
            residual = residual + folded_rotary_attention(
                lp["self_attn"], y, cos, sin, valid, cfg.n_heads)
    else:
        y = layer_norm(lp["norm_self_att"], residual)
        if cfg.self_attention_model == "rotary":
            cos, sin = pos
            y = rotary_mha(lp["self_attn"], y, cos, sin, valid, cfg.n_heads,
                           use_fused=use_fused)
        else:
            y = relpos_mha(lp["self_attn"], y, pos, valid, cfg.n_heads,
                           use_fused=use_fused)
        residual = residual + y

    y = layer_norm(lp["norm_conv"], residual)
    y, new_stats = conformer_conv(lp["conv"], y, valid, cfg.conv_norm_type,
                                  train=train, bn_axis_name=bn_axis_name)
    residual = residual + y

    y = ffn(lp["feed_forward2"], layer_norm(lp["norm_feed_forward2"], residual))
    residual = residual + 0.5 * y
    return layer_norm(lp["norm_out"], residual), new_stats


def conformer_forward(
    params: Params,
    feats: jnp.ndarray,
    lengths: jnp.ndarray,
    cfg: EncoderConfig,
    pos: Any,
    compute_dtype: jnp.dtype = jnp.float32,
    train: bool = False,
    bn_axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[Params]]:
    """Encoder forward.

    feats [B, T, F] (time-major features), lengths [B] in feature frames,
    pos = (cos, sin) sliced to T' for rotary, or pos_emb [2T'-1, D] for
    rel_pos.  Returns (encoded [B, T', D], out_lengths [B], new_bn_stats).
    """
    feats = feats.astype(compute_dtype)
    if cfg.subsampling == "conv2d":
        x, out_len = striding_subsampling_conv2d(
            params["pre_encode"], feats, lengths,
            cfg.num_subsampling_stages, cfg.subs_kernel_size)
    else:
        x, out_len = striding_subsampling_conv1d(
            params["pre_encode"], feats, lengths,
            cfg.num_subsampling_stages, cfg.subs_kernel_size)

    t = x.shape[1]
    valid = jnp.arange(t)[None, :] < out_len[:, None]    # [B, T'] True=real

    def body(carry, lp):
        h = carry
        out, new_stats = _layer_forward(lp, h, pos, valid, cfg, train,
                                        bn_axis_name)
        return out, new_stats

    if cfg.activation_checkpointing and train:
        if cfg.remat_policy == "dots":
            body = jax.checkpoint(
                body,
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
        else:
            body = jax.checkpoint(body)

    x, bn_stats = jax.lax.scan(body, x, params["layers"])
    if not (train and cfg.conv_norm_type == "batch_norm"):
        bn_stats = None
    return x, out_len, bn_stats


def encoded_length(lengths: jnp.ndarray, cfg: EncoderConfig) -> jnp.ndarray:
    """Feature-frame lengths -> encoder-frame lengths."""
    return subsampled_length(lengths, cfg.num_subsampling_stages,
                             cfg.subs_kernel_size)
