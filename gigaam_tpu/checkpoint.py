"""Reference-checkpoint ingestion: torch ``.ckpt`` -> native config + params.

The reference stores ``{"cfg": OmegaConf DictConfig, "state_dict": ...}``
(``gigaam/__init__.py:167,185``) and hydra-instantiates modules from the
embedded cfg.  This module:

* unpickles those checkpoints **without** omegaconf/hydra installed (stub
  classes capture the pickled state; ``_content`` trees are unwrapped),
* maps every torch parameter layout onto ours (see the table below),
* translates the OmegaConf cfg into our typed ``ModelConfig``.

Layout mapping (torch -> ours):
  Linear            w [out, in]        -> [in, out] (transpose)
  Conv1d (subsamp)  w [Cout, Cin, K]   -> [K, Cin, Cout]
  Conv2d (subsamp)  w [Cout, Cin, Kh, Kw] -> [Kh, Kw, Cin, Cout]
  pointwise Conv1d  w [Cout, Cin, 1]   -> [Cin, Cout]
  depthwise Conv1d  w [C, 1, K]        -> [K, 1, C]
  LSTM              weight_ih/hh [4H, in] -> [in, 4H]; b = b_ih + b_hh
  BatchNorm         weight/bias/running_mean/running_var ->
                    scale/bias/mean/var
Per-layer encoder params are stacked along a leading layer axis
(``models/encoder.py``).  torch is only needed at conversion time, never at
inference/training time.
"""

from __future__ import annotations

import io
import pickle
import sys
import types
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from .config import (
    CTCHeadConfig,
    DecodingConfig,
    EmoHeadConfig,
    EncoderConfig,
    FeaturesConfig,
    ModelConfig,
    RNNTDecoderConfig,
    RNNTHeadConfig,
    RNNTJointConfig,
)


# ---------------------------------------------------------------------------
# Torch checkpoint loading without omegaconf/hydra
# ---------------------------------------------------------------------------

class _StubObject:
    """Catch-all unpickle target: records ctor args and state."""

    def __init__(self, *args, **kwargs):
        self._args = args
        self._kwargs = kwargs

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.__dict__["_state"] = state

    def __call__(self, *args, **kwargs):  # some reduces call the object
        return self


def _install_stub_modules() -> List[str]:
    """Register stub modules for pickle targets absent at runtime."""
    created = []
    for name in [
        "omegaconf", "omegaconf.dictconfig", "omegaconf.listconfig",
        "omegaconf.base", "omegaconf.nodes",
    ]:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__getattr__ = lambda attr, _m=name: _StubObject  # type: ignore
            sys.modules[name] = mod
            created.append(name)
    return created


def _unwrap(node: Any) -> Any:
    """Recursively unwrap stubbed OmegaConf containers to plain dict/list.

    Handles real omegaconf pickle layouts (proven against the committed
    ``tests/data/ref_cfg_omegaconf.ckpt`` fixture): ValueNode subclasses
    carry the payload in ``_val`` (checked FIRST — value nodes never have
    ``_content``), containers in ``_content``; ``_parent`` back-references
    are never followed, so the pickle-memo cycles are harmless.
    """
    d = getattr(node, "__dict__", None) if not isinstance(node, dict) else None
    if isinstance(node, _StubObject) or (
            isinstance(d, dict) and ("_val" in d or "_content" in d)):
        # either our stub, or a REAL omegaconf node (containers carry
        # ``_content``, value nodes ``_val``) — reached when omegaconf is
        # importable so _install_stub_modules left it alone
        if "_val" in d:  # ValueNode (Any/String/Integer/Float/Boolean/...)
            return _unwrap(d["_val"])
        content = d.get("_content", d.get("_state"))
        if content is None and "_args" in d and d["_args"]:
            content = d["_args"][0]
        return _unwrap(content)
    if isinstance(node, dict):
        # keep hydra's "_target_" (``_head_kind`` dispatches on it); drop
        # the other OmegaConf bookkeeping keys
        return {k: _unwrap(v) for k, v in node.items()
                if k == "_target_" or not str(k).startswith("_")}
    if isinstance(node, (list, tuple)):
        return [_unwrap(v) for v in node]
    if hasattr(node, "_val"):  # ValueNode
        return _unwrap(node._val)
    return node


_INTERP_RE = None  # compiled lazily


def _resolve_interpolations(tree: Any) -> Any:
    """Resolve OmegaConf ``${dotted.path}`` interpolations in an unwrapped
    cfg tree.

    Pickled configs carry interpolations *unresolved* (OmegaConf resolves
    lazily at access time; ``hydra.utils.instantiate`` does it for the
    reference at load, ``gigaam/model.py:24-25``).  Supports absolute
    dotted paths and whole-value or in-string substitution; unknown paths
    are left verbatim.  Nested references resolve via fixpoint iteration.
    """
    global _INTERP_RE
    import re

    if _INTERP_RE is None:
        _INTERP_RE = re.compile(r"\$\{([A-Za-z0-9_.]+)\}")

    def lookup(path: str):
        cur = tree
        for part in path.split("."):
            if isinstance(cur, dict) and part in cur:
                cur = cur[part]
            elif isinstance(cur, list) and part.isdigit() \
                    and int(part) < len(cur):
                cur = cur[int(part)]
            else:
                return None, False
        return cur, True

    def subst(val):
        if not isinstance(val, str):
            return val, False
        m = _INTERP_RE.fullmatch(val)
        if m:  # whole-value: preserve the referenced type
            target, ok = lookup(m.group(1))
            return (target, True) if ok else (val, False)

        changed = False

        def repl(mm):
            nonlocal changed
            target, ok = lookup(mm.group(1))
            if ok and not isinstance(target, (dict, list)):
                changed = True
                return str(target)
            return mm.group(0)

        out = _INTERP_RE.sub(repl, val)
        return out, changed

    for _ in range(8):  # bounded fixpoint for chained references
        changed = False

        def walk(node):
            nonlocal changed
            if isinstance(node, dict):
                for k, v in node.items():
                    if isinstance(v, (dict, list)):
                        walk(v)
                    else:
                        nv, ch = subst(v)
                        if ch:
                            node[k] = nv
                            changed = True
            elif isinstance(node, list):
                for i, v in enumerate(node):
                    if isinstance(v, (dict, list)):
                        walk(v)
                    else:
                        nv, ch = subst(v)
                        if ch:
                            node[i] = nv
                            changed = True

        walk(tree)
        if not changed:
            break
    return tree


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """torch.load a reference checkpoint, stubbing omegaconf if missing."""
    import torch

    created = _install_stub_modules()
    try:
        with open(path, "rb") as f:
            ckpt = torch.load(f, map_location="cpu", weights_only=False)
    finally:
        for name in created:
            sys.modules.pop(name, None)
    return ckpt


def state_dict_to_numpy(sd: Dict[str, Any]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().to("cpu").float().numpy()
        else:
            out[k] = np.asarray(v, dtype=np.float32)
    return out


# ---------------------------------------------------------------------------
# Config translation
# ---------------------------------------------------------------------------

def _head_kind(head_cfg: Dict[str, Any]) -> str:
    target = str(head_cfg.get("_target_", ""))
    if "CTCHead" in target:
        return "ctc"
    if "RNNTHead" in target:
        return "rnnt"
    if "decoder" in head_cfg and "joint" in head_cfg:
        return "rnnt"
    if "num_classes" in head_cfg and "feat_in" in head_cfg:
        return "ctc"
    return "emo"


def config_from_reference(cfg: Dict[str, Any], model_name: str) -> ModelConfig:
    """Translate an unwrapped reference cfg tree into ModelConfig."""
    pre = cfg.get("preprocessor", {}) or {}
    sr = int(pre.get("sample_rate", 16000))
    feats = FeaturesConfig(
        sample_rate=sr,
        features=int(pre.get("features", 64)),
        win_length=int(pre.get("win_length", sr // 40)),
        hop_length=int(pre.get("hop_length", sr // 100)),
        n_fft=int(pre.get("n_fft", sr // 40)),
        center=bool(pre.get("center", True)),
        dither=float(pre.get("dither", 0.0) or 0.0),
    )
    e = cfg.get("encoder", {}) or {}
    enc = EncoderConfig(
        feat_in=int(e.get("feat_in", 64)),
        n_layers=int(e.get("n_layers", 16)),
        d_model=int(e.get("d_model", 768)),
        subsampling=str(e.get("subsampling", "conv2d")),
        subs_kernel_size=int(e.get("subs_kernel_size", 3)),
        subsampling_factor=int(e.get("subsampling_factor", 4)),
        ff_expansion_factor=int(e.get("ff_expansion_factor", 4)),
        self_attention_model=str(e.get("self_attention_model", "rotary")),
        n_heads=int(e.get("n_heads", 16)),
        pos_emb_max_len=int(e.get("pos_emb_max_len", 5000)),
        conv_norm_type=str(e.get("conv_norm_type", "batch_norm")),
        conv_kernel_size=int(e.get("conv_kernel_size", 31)),
    )

    head_cfg = cfg.get("head")
    dec_cfg = cfg.get("decoding")
    head: Any = None
    decoding: Optional[DecodingConfig] = None
    model_class = "ssl"

    if head_cfg:
        kind = _head_kind(head_cfg)
        if kind == "ctc":
            model_class = "asr"
            head = CTCHeadConfig(
                feat_in=int(head_cfg.get("feat_in", enc.d_model)),
                num_classes=int(head_cfg["num_classes"]))
        elif kind == "rnnt":
            model_class = "asr"
            d = head_cfg.get("decoder", {})
            j = head_cfg.get("joint", {})
            head = RNNTHeadConfig(
                decoder=RNNTDecoderConfig(
                    pred_hidden=int(d.get("pred_hidden", 320)),
                    pred_rnn_layers=int(d.get("pred_rnn_layers", 1)),
                    num_classes=int(d["num_classes"])),
                joint=RNNTJointConfig(
                    enc_hidden=int(j.get("enc_hidden", enc.d_model)),
                    pred_hidden=int(j.get("pred_hidden", 320)),
                    joint_hidden=int(j.get("joint_hidden", 320)),
                    num_classes=int(j["num_classes"])))
        else:
            model_class = "emo"
            head = EmoHeadConfig(
                feat_in=int(head_cfg.get("in_features",
                                         head_cfg.get("feat_in", enc.d_model))),
                num_classes=int(head_cfg.get("out_features",
                                             head_cfg.get("num_classes", 4))))

    if dec_cfg:
        vocab = dec_cfg.get("vocabulary") or []
        decoding = DecodingConfig(
            kind=("rnnt_greedy" if isinstance(head, RNNTHeadConfig)
                  else "ctc_greedy"),
            vocabulary=[str(v) for v in vocab],
            model_path=dec_cfg.get("model_path"),
            max_symbols_per_step=int(
                dec_cfg.get("max_symbols_per_step", 10)))

    id2name = cfg.get("id2name")
    if id2name is not None and isinstance(id2name, dict):
        # numeric order: lexicographic sort would put '10' before '2' for
        # string keys, silently mislabeling classes past 9
        id2name = [id2name[k] for k in sorted(id2name, key=lambda k: int(k))]

    return ModelConfig(
        model_name=model_name, model_class=model_class,
        preprocessor=feats, encoder=enc, head=head, decoding=decoding,
        id2name=id2name)


# ---------------------------------------------------------------------------
# State-dict mapping
# ---------------------------------------------------------------------------

def _convert_subsampling(sd: Dict[str, np.ndarray], enc: EncoderConfig,
                         prefix: str) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    # reference Sequential interleaves ReLU: conv modules sit at 0, 2, 4...
    for i in range(enc.num_subsampling_stages):
        w = sd[f"{prefix}conv.{2 * i}.weight"]
        b = sd[f"{prefix}conv.{2 * i}.bias"]
        if enc.subsampling == "conv2d":
            out[f"conv_{i}"] = {"w": w.transpose(2, 3, 1, 0), "b": b}
        else:
            out[f"conv_{i}"] = {"w": w.transpose(2, 1, 0), "b": b}
    if enc.subsampling == "conv2d":
        out["out"] = {"w": sd[f"{prefix}out.weight"].T,
                      "b": sd[f"{prefix}out.bias"]}
    return out


def _linear(sd, name) -> Dict[str, np.ndarray]:
    p = {"w": sd[f"{name}.weight"].T}
    if f"{name}.bias" in sd:
        p["b"] = sd[f"{name}.bias"]
    return p


def _norm(sd, name) -> Dict[str, np.ndarray]:
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _convert_layer(sd: Dict[str, np.ndarray], enc: EncoderConfig,
                   prefix: str) -> Dict[str, Any]:
    attn: Dict[str, Any] = {
        "linear_q": _linear(sd, f"{prefix}self_attn.linear_q"),
        "linear_k": _linear(sd, f"{prefix}self_attn.linear_k"),
        "linear_v": _linear(sd, f"{prefix}self_attn.linear_v"),
        "linear_out": _linear(sd, f"{prefix}self_attn.linear_out"),
    }
    if enc.self_attention_model == "rel_pos":
        attn["linear_pos"] = _linear(sd, f"{prefix}self_attn.linear_pos")
        attn["pos_bias_u"] = sd[f"{prefix}self_attn.pos_bias_u"]
        attn["pos_bias_v"] = sd[f"{prefix}self_attn.pos_bias_v"]

    bn_name = f"{prefix}conv.batch_norm"
    if enc.conv_norm_type == "batch_norm":
        bn = {"scale": sd[f"{bn_name}.weight"], "bias": sd[f"{bn_name}.bias"],
              "mean": sd[f"{bn_name}.running_mean"],
              "var": sd[f"{bn_name}.running_var"]}
    else:
        bn = _norm(sd, bn_name)

    # value/gate halves of the GLU projection stored as separate leaves
    # (torch fuses them as [2C, C, 1]; see ops/conformer_ops.py for why)
    pc1_w = sd[f"{prefix}conv.pointwise_conv1.weight"][:, :, 0].T
    pc1_b = sd[f"{prefix}conv.pointwise_conv1.bias"]
    half = pc1_w.shape[1] // 2
    conv = {
        "pointwise_conv1": {
            "w_value": pc1_w[:, :half], "b_value": pc1_b[:half],
            "w_gate": pc1_w[:, half:], "b_gate": pc1_b[half:]},
        "depthwise_conv": {
            "w": sd[f"{prefix}conv.depthwise_conv.weight"].transpose(2, 1, 0),
            "b": sd[f"{prefix}conv.depthwise_conv.bias"]},
        "batch_norm": bn,
        "pointwise_conv2": {
            "w": sd[f"{prefix}conv.pointwise_conv2.weight"][:, :, 0].T,
            "b": sd[f"{prefix}conv.pointwise_conv2.bias"]},
    }
    return {
        "norm_feed_forward1": _norm(sd, f"{prefix}norm_feed_forward1"),
        "feed_forward1": {
            "linear1": _linear(sd, f"{prefix}feed_forward1.linear1"),
            "linear2": _linear(sd, f"{prefix}feed_forward1.linear2")},
        "norm_self_att": _norm(sd, f"{prefix}norm_self_att"),
        "self_attn": attn,
        "norm_conv": _norm(sd, f"{prefix}norm_conv"),
        "conv": conv,
        "norm_feed_forward2": _norm(sd, f"{prefix}norm_feed_forward2"),
        "feed_forward2": {
            "linear1": _linear(sd, f"{prefix}feed_forward2.linear1"),
            "linear2": _linear(sd, f"{prefix}feed_forward2.linear2")},
        "norm_out": _norm(sd, f"{prefix}norm_out"),
    }


def convert_encoder(sd: Dict[str, np.ndarray], enc: EncoderConfig,
                    prefix: str = "encoder.") -> Dict[str, Any]:
    layers = [
        _convert_layer(sd, enc, f"{prefix}layers.{i}.")
        for i in range(enc.n_layers)
    ]
    import jax

    return {
        "pre_encode": _convert_subsampling(sd, enc, f"{prefix}pre_encode."),
        "layers": jax.tree.map(lambda *xs: np.stack(xs), *layers),
    }


def convert_head(sd: Dict[str, np.ndarray], head: Any,
                 prefix: str = "head.") -> Dict[str, Any]:
    if isinstance(head, CTCHeadConfig):
        w = sd[f"{prefix}decoder_layers.0.weight"][:, :, 0].T
        return {"proj": {"w": w, "b": sd[f"{prefix}decoder_layers.0.bias"]}}
    if isinstance(head, RNNTHeadConfig):
        layers = []
        for li in range(head.decoder.pred_rnn_layers):
            layers.append({
                "w_ih": sd[f"{prefix}decoder.lstm.weight_ih_l{li}"].T,
                "w_hh": sd[f"{prefix}decoder.lstm.weight_hh_l{li}"].T,
                "b": (sd[f"{prefix}decoder.lstm.bias_ih_l{li}"]
                      + sd[f"{prefix}decoder.lstm.bias_hh_l{li}"]),
            })
        return {
            "decoder": {"embed": sd[f"{prefix}decoder.embed.weight"],
                        "lstm": layers},
            "joint": {
                "enc": _linear(sd, f"{prefix}joint.enc"),
                "pred": _linear(sd, f"{prefix}joint.pred"),
                "out": _linear(sd, f"{prefix}joint.joint_net.1"),
            },
        }
    if isinstance(head, EmoHeadConfig):
        # emo head is a single Linear; accept both bare and nested names
        for cand in (f"{prefix}weight", f"{prefix}linear.weight",
                     f"{prefix}0.weight"):
            if cand in sd:
                base = cand[: -len("weight")]
                return {"proj": {"w": sd[f"{base}weight"].T,
                                 "b": sd[f"{base}bias"]}}
        raise KeyError(f"emo head weights not found under prefix {prefix!r}")
    raise ValueError(f"Unknown head config: {type(head)}")


def convert_state_dict(sd: Dict[str, np.ndarray],
                       cfg: ModelConfig) -> Dict[str, Any]:
    params: Dict[str, Any] = {"encoder": convert_encoder(sd, cfg.encoder)}
    if cfg.head is not None:
        params["head"] = convert_head(sd, cfg.head)
    import jax
    import jax.numpy as jnp

    return jax.tree.map(jnp.asarray, params)


# ---------------------------------------------------------------------------
# Top-level entry points
# ---------------------------------------------------------------------------

def convert_reference_checkpoint(
    path: str, model_name: Optional[str] = None,
    ckpt: Optional[Dict[str, Any]] = None,
) -> Tuple[ModelConfig, Dict[str, Any]]:
    """Load + convert a reference ``.ckpt`` (pretrained or fine-tuned).

    ``ckpt`` may carry an already-torch.loaded checkpoint dict to avoid a
    second multi-GB deserialization."""
    if ckpt is None:
        ckpt = load_torch_checkpoint(path)

    if "hyper_parameters" in ckpt and "cfg" not in ckpt:
        # fine-tuned Lightning checkpoint (``gigaam/__init__.py:139-156``):
        # state_dict carries preprocessor./encoder./head. keys; cfg comes
        # from the base model name, which the caller must have converted.
        raise ValueError(
            "Fine-tuned Lightning checkpoints need the base model's cfg; "
            "convert the base checkpoint first and use "
            "apply_finetuned_state_dict().")

    cfg_tree = _unwrap(ckpt["cfg"])
    if not isinstance(cfg_tree, dict):
        raise ValueError(f"Could not unwrap checkpoint cfg from {path}")
    cfg_tree = _resolve_interpolations(cfg_tree)
    name = model_name or str(cfg_tree.get("model_name", "converted"))
    cfg = config_from_reference(cfg_tree, name)
    sd = state_dict_to_numpy(ckpt["state_dict"])
    params = convert_state_dict(sd, cfg)
    return cfg, params


def apply_finetuned_state_dict(
    cfg: ModelConfig, path: str,
    ckpt: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    """Convert a fine-tuned Lightning ckpt's state_dict with a known cfg.

    The reference fine-tune flow checkpoints the *whole* wrapped model
    (preprocessor./encoder./head. keys), so the returned params are rebuilt
    entirely from this state_dict — missing keys fail loudly in
    convert_state_dict rather than silently keeping base weights."""
    if ckpt is None:
        ckpt = load_torch_checkpoint(path)
    sd = state_dict_to_numpy({
        k: v for k, v in ckpt["state_dict"].items()
        if k.startswith(("preprocessor.", "encoder.", "head."))
    })
    return convert_state_dict(sd, cfg)


# ---------------------------------------------------------------------------
# pyannote segmentation (neural VAD) conversion
# ---------------------------------------------------------------------------

def _sinc_taps_fallback(low_hz_: np.ndarray, band_hz_: np.ndarray,
                        kernel_size: int, sample_rate: int = 16000,
                        min_low_hz: float = 50.0,
                        min_band_hz: float = 50.0) -> np.ndarray:
    """Materialise asteroid ``ParamSincFB`` FIR taps from its parameters.

    Used when asteroid-filterbanks is not importable at conversion time.
    The filterbank is the SincNet band-pass bank plus its Hilbert (sine)
    pair: ``n_filters = 2 * len(low_hz_)``; Hamming half-window.
    Returns [n_filters, kernel_size].
    """
    low = min_low_hz + np.abs(low_hz_.reshape(-1, 1))
    high = np.clip(low + min_band_hz + np.abs(band_hz_.reshape(-1, 1)),
                   min_low_hz, sample_rate / 2)
    band = (high - low)[:, 0]

    half = int(kernel_size / 2)
    n_lin = np.linspace(0, kernel_size / 2 - 1, num=half)
    window = 0.54 - 0.46 * np.cos(2 * np.pi * n_lin / kernel_size)
    n_ = (2 * np.pi
          * np.arange(-(kernel_size - 1) / 2.0, 0).reshape(1, -1)
          / sample_rate)

    ft_low = low @ n_
    ft_high = high @ n_

    cos_left = ((np.sin(ft_high) - np.sin(ft_low)) / (n_ / 2)) * window
    cos_center = 2 * band.reshape(-1, 1)
    cos_right = cos_left[:, ::-1]
    cos_f = np.concatenate([cos_left, cos_center, cos_right], axis=1)

    sin_left = ((np.cos(ft_low) - np.cos(ft_high)) / (n_ / 2)) * window
    sin_center = np.zeros_like(cos_center)
    sin_right = -sin_left[:, ::-1]
    sin_f = np.concatenate([sin_left, sin_center, sin_right], axis=1)

    taps = np.concatenate([cos_f, sin_f], axis=0)
    norm = 2 * np.concatenate([band, band]).reshape(-1, 1)
    return (taps / norm).astype(np.float32)


def _materialize_sinc_taps(sd: Dict[str, np.ndarray],
                           kernel_size: int,
                           sample_rate: int) -> np.ndarray:
    """[n_filters, kernel] taps from ``low_hz_``/``band_hz_`` parameters."""
    low = sd["sincnet.conv1d.0.filterbank.low_hz_"]
    band = sd["sincnet.conv1d.0.filterbank.band_hz_"]
    try:  # exact: run the real filterbank construction if it is installed
        import torch
        from asteroid_filterbanks import ParamSincFB

        fb = ParamSincFB(2 * low.shape[0], kernel_size, stride=1,
                         sample_rate=sample_rate)
        with torch.no_grad():
            fb.low_hz_.copy_(torch.from_numpy(low.reshape(-1, 1)))
            fb.band_hz_.copy_(torch.from_numpy(band.reshape(-1, 1)))
            return fb.filters().squeeze(1).numpy().astype(np.float32)
    except ImportError:
        return _sinc_taps_fallback(low, band, kernel_size, sample_rate)


def convert_pyannote_vad(path: str, kernel_size: int = 251):
    """Convert a pyannote ``segmentation-3.0`` checkpoint (PyanNet) into
    (VADNetConfig, params) for ``gigaam_tpu.models.vad_net``.

    Replaces the reference's runtime pyannote dependency
    (``gigaam/vad_utils.py:41-77``): conversion is one-time and host-side;
    the sinc filterbank is baked to plain FIR taps (inference-constant).
    Accepts a raw state_dict, a Lightning ckpt, or a ``pytorch_model.bin``.
    """
    from .models.vad_net import VADNetConfig

    ckpt = load_torch_checkpoint(path)
    sd_raw = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    sd = state_dict_to_numpy(
        {k[len("model."):] if k.startswith("model.") else k: v
         for k, v in sd_raw.items() if hasattr(v, "detach")})

    n_filters = 2 * sd["sincnet.conv1d.0.filterbank.low_hz_"].shape[0]
    kernel = kernel_size
    def _mod_idx(k: str) -> int:
        return int(k.split(".")[-2])

    # numeric module order (lexicographic would put '10' before '2')
    conv_keys = sorted((k for k in sd if k.startswith("sincnet.conv1d.")
                        and k.endswith(".weight")), key=_mod_idx)
    n_conv_blocks = len(conv_keys)
    lstm_layers = len({k.split("weight_ih_l")[1].split("_reverse")[0]
                       for k in sd if "weight_ih_l" in k})
    lin_keys = sorted((k for k in sd
                       if k.startswith("linear.") and k.endswith(".weight")),
                      key=_mod_idx)
    h = sd["lstm.weight_hh_l0"].shape[1]

    cfg = VADNetConfig(
        sinc_filters=n_filters,
        sinc_kernel=kernel,
        conv_channels=sd[conv_keys[0]].shape[0] if conv_keys else 60,
        conv_kernel=sd[conv_keys[0]].shape[2] if conv_keys else 5,
        n_conv_blocks=n_conv_blocks,
        lstm_hidden=h,
        lstm_layers=lstm_layers,
        linear_hidden=(sd[lin_keys[0]].shape[0]
                       if lin_keys else 128),
        linear_layers=len(lin_keys),
        n_classes=sd["classifier.weight"].shape[0],
    )

    taps = _materialize_sinc_taps(sd, kernel, cfg.sample_rate)

    def lstm_dir(li: int, suffix: str) -> Dict[str, np.ndarray]:
        return {
            "w_ih": sd[f"lstm.weight_ih_l{li}{suffix}"].T,
            "w_hh": sd[f"lstm.weight_hh_l{li}{suffix}"].T,
            "b": (sd[f"lstm.bias_ih_l{li}{suffix}"]
                  + sd[f"lstm.bias_hh_l{li}{suffix}"]),
        }

    params = {
        "wav_norm": {"w": sd["sincnet.wav_norm1d.weight"],
                     "b": sd["sincnet.wav_norm1d.bias"]},
        "sinc": {"taps": taps.T[:, None, :]},          # [K, 1, F]
        "norms": [{"w": sd[f"sincnet.norm1d.{i}.weight"],
                   "b": sd[f"sincnet.norm1d.{i}.bias"]}
                  for i in range(n_conv_blocks + 1)],
        # torch conv weight [out, in, k] -> ours [k, in, out]
        "convs": [{"w": sd[f"sincnet.conv1d.{i + 1}.weight"]
                   .transpose(2, 1, 0),
                   "b": sd[f"sincnet.conv1d.{i + 1}.bias"]}
                  for i in range(n_conv_blocks)],
        "lstm": [{"fwd": lstm_dir(li, ""),
                  "bwd": lstm_dir(li, "_reverse")}
                 for li in range(lstm_layers)],
        "linear": [{"w": sd[f"linear.{i}.weight"].T,
                    "b": sd[f"linear.{i}.bias"]}
                   for i in range(len(lin_keys))],
        "classifier": {"w": sd["classifier.weight"].T,
                       "b": sd["classifier.bias"]},
    }
    return cfg, params
