"""Batch inference driven purely by exported StableHLO artifacts.

The TPU-native analogue of the reference's onnxruntime inference path
(``gigaam/onnx_utils.py:164-331``): restore the serialized serving graphs
with ``load_exported`` and run a dataset through them with NO model code on
the hot path — host frontend -> exported encoder/CTC graph -> host (CTC) or
graph-driven (RNNT) greedy decode.  This is exactly what a serving runtime
that only ships the artifacts does, so it doubles as an export-completeness
check: if ``infer_exported`` can transcribe, the artifact dir is
self-contained.

Decomposition parity with the reference:
* CTC: one fused graph emits log-probs; greedy dedup happens on host numpy
  (reference ``_decode_ctc_batch``, ``onnx_utils.py:39-54``).
* RNNT: the exported encoder / decoder-step / joint-step graphs drive a
  host label loop with ``MAX_LETTERS_PER_FRAME = 3``
  (reference ``_decode_rnnt_batch``, ``onnx_utils.py:19,73-161``).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .config import ModelConfig
from .decode.tokenizer import Tokenizer
from .export import ExportedGraph, load_exported
from .frontend import LogMelFrontend

MAX_LETTERS_PER_FRAME = 3  # reference gigaam/onnx_utils.py:19


def _decode_ctc_batch(
    log_probs: np.ndarray, lengths: np.ndarray, tokenizer: Tokenizer
) -> List[str]:
    """Greedy CTC on host numpy (reference ``onnx_utils.py:39-54``)."""
    blank = log_probs.shape[-1] - 1
    labels = log_probs.argmax(axis=-1)  # [B, T]
    texts = []
    for b in range(labels.shape[0]):
        row = labels[b, : int(lengths[b])]
        prev = np.concatenate([[-1], row[:-1]])
        ids = row[(row != blank) & (row != prev)]
        texts.append(tokenizer.decode(ids.tolist()))
    return texts


def _decode_rnnt_batch(
    encoded: np.ndarray,
    enc_lens: np.ndarray,
    decoder: ExportedGraph,
    joint: ExportedGraph,
    tokenizer: Tokenizer,
    state_shape: Tuple[int, int, int],
    max_letters: int = MAX_LETTERS_PER_FRAME,
) -> List[str]:
    """Frame-synchronized greedy label loop over exported decoder/joint
    graphs (reference ``onnx_utils.py:73-161``).

    ``encoded`` [B, T, D] fp32, already padded to the decoder graph's batch.
    The predictor's zero state + blank label reproduces torch's
    ``predict(None, None)`` start (blank embedding row is zero).
    """
    b, t_max, _ = encoded.shape
    blank = len(tokenizer)
    labels = np.full((b,), blank, dtype=np.int32)
    h = np.zeros(state_shape, np.float32)
    c = np.zeros(state_shape, np.float32)
    hyps: List[List[int]] = [[] for _ in range(b)]

    for t in range(int(enc_lens.max(initial=0))):
        active0 = enc_lens > t
        if not active0.any():
            break
        enc_t = np.ascontiguousarray(encoded[:, t, :])
        emitting = active0.copy()
        for _ in range(max_letters):
            pred, h_new, c_new = (np.asarray(x) for x in decoder(labels, h, c))
            logp = np.asarray(joint(enc_t, pred))  # [B, V]
            k = logp.argmax(axis=-1).astype(np.int32)
            emit = emitting & (k != blank)
            if not emit.any():
                break
            for i in np.nonzero(emit)[0]:
                hyps[i].append(int(k[i]))
            # predictor state/label advance only on emission
            labels = np.where(emit, k, labels)
            m = emit[None, :, None]
            h = np.where(m, h_new, h)
            c = np.where(m, c_new, c)
            emitting = emit
    return [tokenizer.decode(ids) for ids in hyps]


def _pick_graph(graphs: Sequence[ExportedGraph], n: int,
                t_feat: int) -> ExportedGraph:
    """Smallest exported bucket that fits (batch n, t_feat frames)."""
    fitting = [g for g in graphs
               if g.meta["batch"] >= n and g.meta["t_feat"] >= t_feat]
    if not fitting:
        raise ValueError(
            f"no exported bucket fits batch={n}, t_feat={t_feat}; "
            f"available: {[(g.meta['batch'], g.meta['t_feat']) for g in graphs]}")
    return min(fitting, key=lambda g: (g.meta["t_feat"], g.meta["batch"]))


class _ExportedBase:
    """Shared frontend/bucketing over an exported artifact dir."""

    def __init__(self, artifact_dir: str):
        self.cfg: ModelConfig
        self.cfg, self.graphs = load_exported(artifact_dir)
        self.frontend = LogMelFrontend(self.cfg.preprocessor)

    def _features(self, wavs: List[np.ndarray]):
        import jax.numpy as jnp

        from .models.model import pad_wav_batch

        # bucketed padding (1 s buckets, same as the live model): padding to
        # the exact per-batch max would recompile the jitted frontend for
        # nearly every distinct batch shape
        batch, lens = pad_wav_batch(wavs)
        feats, feat_lens = self.frontend(jnp.asarray(batch),
                                         jnp.asarray(lens))
        feats = np.asarray(jnp.transpose(feats, (0, 2, 1)))  # [B, T, F]
        return feats, np.asarray(feat_lens)

    def _bucketed(self, kind: str, feats: np.ndarray, feat_lens: np.ndarray):
        n = feats.shape[0]
        g = _pick_graph(self.graphs[kind], n, feats.shape[1])
        gb, gt = g.meta["batch"], g.meta["t_feat"]
        pad = np.zeros((gb, gt, feats.shape[2]), np.float32)
        pad[:n, : feats.shape[1]] = feats
        pad_lens = np.zeros((gb,), np.int32)
        pad_lens[:n] = feat_lens
        return g, pad, pad_lens


class ExportedClassifier(_ExportedBase):
    """Emo probs / SSL embeddings from artifacts alone (the reference's
    non-ASR ``infer_onnx`` families, ``gigaam/onnx_utils.py:204-242``)."""

    def infer_batch(self, wavs: List[np.ndarray]) -> List[np.ndarray]:
        n = len(wavs)
        feats, feat_lens = self._features(wavs)
        kind = "probs" if "probs" in self.graphs else "encoder"
        g, pad, pad_lens = self._bucketed(kind, feats, feat_lens)
        if kind == "probs":  # emo: [B, n_classes]
            out = g(pad, pad_lens)
            probs = np.asarray(out[0] if isinstance(out, tuple) else out)
            return [probs[i] for i in range(n)]
        encoded, enc_lens = g(pad, pad_lens)
        encoded = np.asarray(encoded)
        enc_lens = np.asarray(enc_lens)
        # ssl embeddings, time-major [T', D] per item; copied so a kept
        # embedding doesn't pin the whole padded [gb, T', D] batch buffer
        return [encoded[i, : int(enc_lens[i])].copy() for i in range(n)]


class ExportedASR(_ExportedBase):
    """Callable ASR over an exported artifact dir (no model params/code)."""

    def __init__(self, artifact_dir: str):
        super().__init__(artifact_dir)
        dec = self.cfg.decoding
        assert dec is not None, "exported artifact has no decoding config"
        self.tokenizer = Tokenizer(dec.vocabulary or [], dec.model_path)
        self.is_ctc = "ctc" in self.graphs

    def transcribe_batch(self, wavs: List[np.ndarray]) -> List[str]:
        n = len(wavs)
        feats, feat_lens = self._features(wavs)
        kind = "ctc" if self.is_ctc else "encoder"
        g, pad, pad_lens = self._bucketed(kind, feats, feat_lens)
        gb = g.meta["batch"]

        if self.is_ctc:
            log_probs, enc_lens = (np.asarray(x) for x in g(pad, pad_lens))
            return _decode_ctc_batch(log_probs[:n], enc_lens[:n],
                                     self.tokenizer)

        encoded, enc_lens = g(pad, pad_lens)
        encoded = np.asarray(encoded, np.float32)
        enc_lens = np.asarray(enc_lens, np.int32)
        dec_g = _pick_graph_by_batch(self.graphs["decoder"], gb)
        joint_g = _pick_graph_by_batch(self.graphs["joint"], gb)
        db = dec_g.meta["batch"]
        if db != gb:  # decoder bucket batch may differ from encoder's
            encoded = _pad_batch_dim(encoded, db)
            enc_lens = _pad_batch_dim(enc_lens, db)
        head = self.cfg.head
        state_shape = (head.decoder.pred_rnn_layers, db,
                       head.decoder.pred_hidden)
        enc_lens = enc_lens.copy()
        enc_lens[n:] = 0  # padding rows decode nothing
        # Use the model's own per-frame symbol cap so artifact-only decode
        # is bit-identical to the live decoder (the reference's ONNX path
        # instead pins MAX_LETTERS_PER_FRAME=3, ``onnx_utils.py:19``, and
        # tolerates divergence on degenerate inputs).
        max_letters = self.cfg.decoding.max_symbols_per_step
        texts = _decode_rnnt_batch(encoded, enc_lens, dec_g, joint_g,
                                   self.tokenizer, state_shape, max_letters)
        return texts[:n]


def _pick_graph_by_batch(graphs: Sequence[ExportedGraph],
                         n: int) -> ExportedGraph:
    fitting = [g for g in graphs if g.meta["batch"] >= n]
    if not fitting:
        raise ValueError(f"no exported graph with batch >= {n}")
    return min(fitting, key=lambda g: g.meta["batch"])


def _pad_batch_dim(x: np.ndarray, b: int) -> np.ndarray:
    if x.shape[0] == b:
        return x
    out = np.zeros((b,) + x.shape[1:], x.dtype)
    out[: x.shape[0]] = x
    return out


def infer_exported(
    artifact_dir: str,
    items: Sequence,
    batch_size: int = 8,
    refs: Optional[List[str]] = None,
) -> Dict[str, object]:
    """Transcribe ``items`` (paths or float arrays) with exported graphs only.

    Mirrors the reference's ``infer_onnx`` dataset loop
    (``onnx_utils.py:164-279``): batches items, returns hypotheses and —
    when references are given — the dual WER metric.
    """
    import json
    import os
    import warnings

    from .audio import load_audio

    # only the manifest is needed to pick the family — a full load_exported
    # here would deserialize every StableHLO graph a second time
    with open(os.path.join(artifact_dir, "export_manifest.json")) as f:
        model_class = json.load(f).get("model_class", "asr")

    def _load(it) -> np.ndarray:
        return it if isinstance(it, np.ndarray) else load_audio(str(it))

    runner = (ExportedClassifier(artifact_dir)
              if model_class in ("ssl", "emo")
              else ExportedASR(artifact_dir))
    # clamp to the largest exported row bucket: chunking at a smaller batch
    # keeps every item (unlike truncation) and still fails loudly inside
    # _pick_graph if no bucket exists at all
    kind = ("ctc" if "ctc" in runner.graphs
            else "probs" if "probs" in runner.graphs else "encoder")
    max_rows = max(g.meta["batch"] for g in runner.graphs[kind])
    if batch_size > max_rows:
        warnings.warn(f"batch_size={batch_size} exceeds the largest "
                      f"exported bucket ({max_rows}); running at {max_rows}")
        batch_size = max_rows

    results: List = []
    # audio decodes per mini-batch: loading the whole dataset up front would
    # hold hours of float32 audio in RAM before the first batch runs
    for i in range(0, len(items), batch_size):
        wavs = [_load(it) for it in items[i: i + batch_size]]
        if isinstance(runner, ExportedClassifier):
            results.extend(runner.infer_batch(wavs))
        else:
            results.extend(runner.transcribe_batch(wavs))
    if isinstance(runner, ExportedClassifier):
        return {"hypotheses": results}
    hyps: List[str] = results
    out: Dict[str, object] = {"hypotheses": hyps}
    if refs is not None:
        from .metrics import compute_wer

        wer_e2e, wer_raw = compute_wer(hyps, list(refs))
        out.update(wer_e2e=wer_e2e, wer_raw=wer_raw)
    return out
