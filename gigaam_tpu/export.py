"""Model export: serialized StableHLO artifacts via ``jax.export``.

TPU-native replacement for the reference's ONNX story
(``gigaam/model.py:65-71,151-193``, ``gigaam/onnx_utils.py``), keeping its
artifact decomposition:

* ssl / emo -> one encoder (or probs) graph;
* CTC       -> one fused graph: features -> (log_probs, encoded_len)
  (the reference exports encoder+head together for CTC);
* RNNT      -> three graphs: encoder, decoder step, joint step
  (``model.py:178-193``) so a serving runtime can drive the label loop.

Every graph is exported per padded-shape *bucket* (static shapes are the
XLA contract; the reference's dynamic axes have no analogue), serialized
with ``jax.export`` (StableHLO), and written next to a config json.
``load_exported`` restores callables from the artifacts without any model
code — the deserialized functions embed the weights as constants.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from .config import CTCHeadConfig, EmoHeadConfig, ModelConfig, RNNTHeadConfig
from .frontend import num_frames
from .models import heads as heads_lib
from .models.model import GigaAM, GigaAMASR
from .ops.conformer_ops import static_subsampled_length


def _export_fn(fn: Callable, args: Tuple[Any, ...]) -> bytes:
    exp = jax_export.export(jax.jit(fn))(*args)
    return exp.serialize()


def _feat_spec(model: GigaAM, batch: int, t_feat: int):
    f = model.cfg.preprocessor.features
    return (
        jax.ShapeDtypeStruct((batch, t_feat, f), jnp.float32),   # feats [B,T,F]
        jax.ShapeDtypeStruct((batch,), jnp.int32),               # lengths
    )


def export_model(
    model: GigaAM,
    out_dir: str,
    batch_sizes: Sequence[int] = (1, 8),
    audio_seconds: Sequence[int] = (5, 10, 20),
) -> Dict[str, Any]:
    """Export a model's serving graphs for a set of shape buckets.

    Graph inputs are *features* [B, T_feat, F] + lengths (time-major), the
    same contract as the reference's exported encoders
    (``encoder.py:597-603`` dynamic axes) — host feature extraction is the
    serving frontend's job (see ``serve.py``), or export the fused
    wav->text graphs via the model API instead.
    """
    os.makedirs(out_dir, exist_ok=True)
    cfg = model.cfg
    name = cfg.model_name
    manifest: Dict[str, Any] = {
        "model_name": name,
        "model_class": cfg.model_class,
        "graphs": {},
    }

    t_feats = sorted({
        num_frames(s * cfg.preprocessor.sample_rate, cfg.preprocessor)
        for s in audio_seconds
    })

    def encoder_fn(feats, lengths, pos):
        from .models.encoder import conformer_forward

        enc, enc_lens, _ = conformer_forward(
            model.params["encoder"], feats, lengths, cfg.encoder, pos,
            compute_dtype=model.compute_dtype)
        return enc.astype(jnp.float32), enc_lens

    def write(fname: str, data: bytes, meta: Dict[str, Any]) -> None:
        with open(os.path.join(out_dir, fname), "wb") as f:
            f.write(data)
        manifest["graphs"].setdefault(meta.pop("graph"), []).append(
            dict(meta, file=fname))

    for b in batch_sizes:
        for t_feat in t_feats:
            t_sub = static_subsampled_length(
                t_feat, cfg.encoder.num_subsampling_stages,
                cfg.encoder.subs_kernel_size)
            pos = model._pos_for_tfeat(t_feat)
            feats_spec = _feat_spec(model, b, t_feat)

            if isinstance(getattr(cfg, "head", None), CTCHeadConfig):
                def ctc_fn(feats, lengths):
                    enc, enc_lens = encoder_fn(feats, lengths, pos)
                    return (heads_lib.ctc_log_probs(
                        model.params["head"], enc), enc_lens)

                write(f"{name}_ctc_b{b}_t{t_feat}.shlo",
                      _export_fn(ctc_fn, feats_spec),
                      {"graph": "ctc", "batch": b, "t_feat": t_feat,
                       "t_sub": t_sub})
            elif isinstance(getattr(cfg, "head", None), EmoHeadConfig):
                # fused features -> class probs graph (the reference's emo
                # ONNX + host softmax path, ``gigaam/onnx_utils.py``)
                def emo_fn(feats, lengths):
                    enc, enc_lens = encoder_fn(feats, lengths, pos)
                    return heads_lib.emo_probs(
                        model.params["head"], enc, enc_lens)

                write(f"{name}_probs_b{b}_t{t_feat}.shlo",
                      _export_fn(emo_fn, feats_spec),
                      {"graph": "probs", "batch": b, "t_feat": t_feat,
                       "t_sub": t_sub})
            else:
                def enc_only(feats, lengths):
                    return encoder_fn(feats, lengths, pos)

                write(f"{name}_encoder_b{b}_t{t_feat}.shlo",
                      _export_fn(enc_only, feats_spec),
                      {"graph": "encoder", "batch": b, "t_feat": t_feat,
                       "t_sub": t_sub})

    if isinstance(getattr(cfg, "head", None), RNNTHeadConfig):
        dec_cfg = cfg.head.decoder
        for b in batch_sizes:
            def decoder_step(labels, h, c):
                return heads_lib.rnnt_predict_step(
                    model.params["head"], labels, h, c)

            def joint_step(enc_t, pred):
                return heads_lib.rnnt_joint_step(
                    model.params["head"], enc_t, pred)

            lbl = jax.ShapeDtypeStruct((b,), jnp.int32)
            state = jax.ShapeDtypeStruct(
                (dec_cfg.pred_rnn_layers, b, dec_cfg.pred_hidden), jnp.float32)
            write(f"{name}_decoder_b{b}.shlo",
                  _export_fn(decoder_step, (lbl, state, state)),
                  {"graph": "decoder", "batch": b})
            enc_t = jax.ShapeDtypeStruct(
                (b, cfg.head.joint.enc_hidden), jnp.float32)
            pred = jax.ShapeDtypeStruct(
                (b, cfg.head.joint.pred_hidden), jnp.float32)
            write(f"{name}_joint_b{b}.shlo",
                  _export_fn(joint_step, (enc_t, pred)),
                  {"graph": "joint", "batch": b})

    # self-contained artifacts: bundle the sentencepiece model (if any) and
    # rewrite its path relative to the artifact dir — an absolute path into
    # the exporting machine's cache would break on any other host
    if (getattr(cfg, "decoding", None) is not None
            and cfg.decoding.model_path):
        import dataclasses
        import shutil

        shutil.copyfile(cfg.decoding.model_path,
                        os.path.join(out_dir, "tokenizer.model"))
        cfg = dataclasses.replace(
            cfg, decoding=dataclasses.replace(
                cfg.decoding, model_path="tokenizer.model"))

    with open(os.path.join(out_dir, "export_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    with open(os.path.join(out_dir, f"{name}.json"), "w") as f:
        f.write(cfg.to_json())
    return manifest


class ExportedGraph:
    """A deserialized StableHLO graph, callable with numpy/jax arrays."""

    def __init__(self, path: str, meta: Dict[str, Any]):
        with open(path, "rb") as f:
            self._exported = jax_export.deserialize(f.read())
        self.meta = meta

    def __call__(self, *args):
        return self._exported.call(*args)


def load_exported(out_dir: str) -> Tuple[ModelConfig, Dict[str, List[ExportedGraph]]]:
    """Load an exported artifact dir -> (config, {graph_kind: [graphs]})."""
    with open(os.path.join(out_dir, "export_manifest.json")) as f:
        manifest = json.load(f)
    with open(os.path.join(out_dir, f"{manifest['model_name']}.json")) as f:
        cfg = ModelConfig.from_dict(json.load(f))
    # bundled tokenizer paths are relative to the artifact dir
    if (getattr(cfg, "decoding", None) is not None and cfg.decoding.model_path
            and not os.path.isabs(cfg.decoding.model_path)):
        import dataclasses

        cfg = dataclasses.replace(
            cfg, decoding=dataclasses.replace(
                cfg.decoding,
                model_path=os.path.join(out_dir, cfg.decoding.model_path)))
    graphs: Dict[str, List[ExportedGraph]] = {}
    for kind, entries in manifest["graphs"].items():
        graphs[kind] = [
            ExportedGraph(os.path.join(out_dir, e["file"]), e)
            for e in entries
        ]
    return cfg, graphs
