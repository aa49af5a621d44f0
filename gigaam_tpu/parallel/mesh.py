"""Device mesh + sharding rules.

Replaces the reference's Lightning DDP/NCCL distribution
(``train_utils/train.py:168``, ``train_utils/module.py:235-237``) with the
TPU-native model: one ``jax.sharding.Mesh`` with ("data", "model") axes,
param/batch shardings annotated via ``NamedSharding``, and XLA inserting
all collectives (gradient psums ride the ICI; no NCCL analogue).

Data parallelism = batch axis 0 over "data".  Tensor parallelism =
Megatron-style sharding of the Conformer FFN / attention projections over
"model" (the reference has no TP at all — SURVEY.md §2.5).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices=None,
) -> Mesh:
    """Create a ("data", "model") mesh.  Defaults to all devices on data."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"{data}x{model} != {n} devices"
    arr = np.array(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_pspec() -> P:
    return P("data")


def _layer_pspecs(attention: str) -> Dict[str, Any]:
    """PartitionSpecs for one stacked Conformer layer pytree (leading axis =
    layer).  Megatron pattern: first matmul column-parallel, second
    row-parallel; XLA inserts the reduce on the row-parallel output."""
    norm = {"scale": P(), "bias": P()}
    ffn = {
        "linear1": {"w": P(None, None, "model"), "b": P(None, "model")},
        "linear2": {"w": P(None, "model", None), "b": P()},
    }
    attn = {
        "linear_q": {"w": P(None, None, "model"), "b": P(None, "model")},
        "linear_k": {"w": P(None, None, "model"), "b": P(None, "model")},
        "linear_v": {"w": P(None, None, "model"), "b": P(None, "model")},
        "linear_out": {"w": P(None, "model", None), "b": P()},
    }
    if attention == "rel_pos":
        attn["linear_pos"] = {"w": P(None, None, "model")}
        attn["pos_bias_u"] = P(None, "model", None)
        attn["pos_bias_v"] = P(None, "model", None)
    conv = {
        # depthwise conv + norm act per-channel: shard channels over "model"
        # GLU halves are separate leaves so (a_i, g_i) land on the same
        # device (Megatron-GLU); a fused 2C column shard would split the
        # value/gate halves across groups and force an activation exchange
        "pointwise_conv1": {
            "w_value": P(None, None, "model"), "b_value": P(None, "model"),
            "w_gate": P(None, None, "model"), "b_gate": P(None, "model")},
        "depthwise_conv": {"w": P(None, None, None, "model"),
                           "b": P(None, "model")},
        "pointwise_conv2": {"w": P(None, "model", None), "b": P()},
        "batch_norm": {"scale": P(None, "model"), "bias": P(None, "model"),
                       "mean": P(None, "model"), "var": P(None, "model")},
    }
    return {
        "norm_feed_forward1": norm, "feed_forward1": ffn,
        "norm_self_att": norm, "self_attn": attn,
        "norm_conv": norm, "conv": conv,
        "norm_feed_forward2": norm, "feed_forward2": ffn,
        "norm_out": norm,
    }


def encoder_pspecs(params: Dict[str, Any], attention: str,
                   conv_norm_type: str = "batch_norm") -> Dict[str, Any]:
    """PartitionSpec pytree matching an encoder param tree."""
    layer = _layer_pspecs(attention)
    if conv_norm_type != "batch_norm":
        layer = dict(layer)
        layer["conv"] = dict(layer["conv"])
        layer["conv"]["batch_norm"] = {"scale": P(None, "model"),
                                       "bias": P(None, "model")}
    # Subsampling convs TP-shard Megatron-style too — replicating them
    # wastes the single biggest pre-encoder block (the 768-channel stage-2
    # conv is ~25% of forward FLOPs).  Even stages shard OUTPUT channels
    # (conv weight's last axis), odd stages contract the sharded input
    # channels (second-to-last axis) and XLA all-reduces the partial sums;
    # the elementwise ReLU/bias/mask between stages are sharding-agnostic.
    # The flatten 'out' linear (conv2d variant) stays replicated: its input
    # is replicated after the odd stage's reduce and it is ~10x cheaper
    # than the stage convs.
    pre: Dict[str, Any] = {}
    for k, v in params["pre_encode"].items():
        if k.startswith("conv_"):
            nd = v["w"].ndim  # 4 = conv2d HWIO, 3 = conv1d WIO
            if int(k.split("_")[1]) % 2 == 0:
                spec = [None] * nd
                spec[-1] = "model"  # column-parallel (output channels)
                pre[k] = {"w": P(*spec), "b": P("model")}
            else:
                spec = [None] * nd
                spec[-2] = "model"  # row-parallel (input channels)
                pre[k] = {"w": P(*spec), "b": P()}
        else:
            pre[k] = jax.tree.map(lambda _: P(), v)
    return {"pre_encode": pre, "layers": layer}


def params_pspecs(params: Dict[str, Any], attention: str,
                  conv_norm_type: str = "batch_norm") -> Dict[str, Any]:
    """Full model param PartitionSpecs: TP encoder; every other top-level
    subtree (ASR/emo heads, SSL pretraining head + frozen quantizer)
    replicated."""
    specs: Dict[str, Any] = {
        "encoder": encoder_pspecs(params["encoder"], attention,
                                  conv_norm_type)
    }
    for key, sub in params.items():
        if key != "encoder":
            specs[key] = jax.tree.map(lambda _: P(), sub)
    return specs


def shard_params(params: Dict[str, Any], mesh: Mesh,
                 specs: Dict[str, Any]) -> Dict[str, Any]:
    """Device-put a param tree onto the mesh with the given specs.

    Note: PartitionSpec is a tuple subclass, i.e. itself a pytree container,
    so the specs tree must lead the map with an ``is_leaf`` guard.
    """
    return jax.tree.map(
        lambda s, x: jax.device_put(x, NamedSharding(mesh, s)),
        specs, params,
        is_leaf=lambda x: isinstance(x, P),
    )


def to_named(mesh: Mesh, specs: Any) -> Any:
    """PartitionSpec pytree -> NamedSharding pytree."""
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))
