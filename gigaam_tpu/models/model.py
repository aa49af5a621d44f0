"""User-facing model classes: GigaAM (SSL), GigaAMASR, GigaAMEmo.

API mirrors the reference (``gigaam/model.py``): ``embed_audio``,
``transcribe``, ``transcribe_longform``, ``get_probs`` — but the execution
model is TPU-native:

* everything from log-mel to greedy decode runs inside jitted functions with
  **static shapes**; audio is padded to 1-second buckets so XLA compiles a
  bounded set of graphs (vs the reference's fully dynamic [B, T] batches);
* activations run in bfloat16 on accelerators (stand-in for the reference's
  fp16 autocast, ``gigaam/model.py:36-37``), fp32 on CPU;
* the RNNT label loop is an on-device ``lax.while_loop``
  (``decode/rnnt_greedy.py``) — no per-step host sync.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..audio import load_audio
from ..config import (
    LONGFORM_THRESHOLD_SEC,
    SAMPLE_RATE,
    CTCHeadConfig,
    EmoHeadConfig,
    ModelConfig,
    RNNTHeadConfig,
)
from ..decode.ctc_greedy import ctc_extract, ctc_greedy_mask
from ..decode.rnnt_greedy import rnnt_extract, rnnt_greedy_decode
from ..decode.timestamps import compute_frame_shift, frames_to_words
from ..decode.tokenizer import Tokenizer
from ..frontend import LogMelFrontend, num_frames
from ..models import heads as heads_lib
from ..models.encoder import (
    PosTables,
    conformer_forward,
    init_encoder_params,
)
from ..types import (
    LongformTranscriptionResult,
    Segment,
    TranscriptionResult,
    Word,
)

BUCKET_SAMPLES = SAMPLE_RATE  # pad waveforms to 1 s buckets (static shapes)


def bucket_length(n: int, bucket: int = BUCKET_SAMPLES) -> int:
    return max(bucket, ((n + bucket - 1) // bucket) * bucket)


def pad_wav_batch(
    wavs: List[np.ndarray], bucket: int = BUCKET_SAMPLES
) -> Tuple[np.ndarray, np.ndarray]:
    """Zero-pad a list of waveforms to a common bucketed length."""
    from ..native import collate

    lens = np.array([len(w) for w in wavs], dtype=np.int32)
    max_len = bucket_length(int(lens.max()), bucket)
    return collate(wavs, max_len), lens


class GigaAM:
    """Self-supervised encoder model (reference ``gigaam/model.py:16-83``)."""

    def __init__(
        self,
        cfg: ModelConfig,
        params: Optional[Dict[str, Any]] = None,
        seed: int = 0,
        compute_dtype: Optional[jnp.dtype] = None,
        use_fused_attention: Optional[bool] = None,
    ):
        on_accel = jax.default_backend() != "cpu"
        if compute_dtype is None:
            compute_dtype = jnp.bfloat16 if on_accel else jnp.float32
        self.compute_dtype = compute_dtype
        # Fused Pallas attention: our SDPA-backend analogue (the reference
        # defaults to torch SDPA on GPU, ``gigaam/encoder.py:456-462``).
        # Auto-on on accelerators for both attention generations (rotary
        # via fused_mha, rel_pos via fused_relpos_mha); override via arg.
        if use_fused_attention is None:
            use_fused_attention = on_accel
        if cfg.encoder.flash_attn != bool(use_fused_attention):
            # copy-on-write: mutating the caller's (possibly shared) config
            # in place would silently change the kernels of other models
            # built from the same object
            import dataclasses

            cfg = dataclasses.replace(
                cfg, encoder=dataclasses.replace(
                    cfg.encoder, flash_attn=bool(use_fused_attention)))
        self.cfg = cfg
        self.frontend = LogMelFrontend(cfg.preprocessor)
        self.pos_tables = PosTables(cfg.encoder)
        # int16 audio wire format for host->device transfers (see
        # ``_device_batch``).  Off by default: on the tunneled dev TPU the
        # host-side quantize costs more than the halved transfer saves;
        # enable for production hosts where PCIe DMA is the bottleneck.
        self._int16_wire = False
        if params is None:
            params = self.init_params(jax.random.PRNGKey(seed))
        self.params = params
        self.mesh = None
        self._encode_jit = jax.jit(self._encode_impl)

    def set_mesh(self, mesh) -> None:
        """Enable data-parallel inference over a ("data", ...) Mesh.

        Params are replicated across the mesh; every batch is sharded over
        the "data" axis (rows padded to a multiple of the DP size).  This
        is the multi-chip/multi-host longform inference path — the
        reference has no inference distribution at all (chunk batches run
        on one GPU, ``gigaam/model.py:219-233``).
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.mesh = mesh
        self.params = jax.device_put(
            self.params, NamedSharding(mesh, P()))
        self._data_sharding = NamedSharding(mesh, P("data"))

    def _dp_pad(self, wavs: List[np.ndarray]) -> Tuple[List[np.ndarray], int]:
        """Pad the batch row count to a multiple of the DP size."""
        if self.mesh is None:
            return wavs, 0
        dsize = self.mesh.shape["data"]
        pad = (-len(wavs)) % dsize
        if pad:
            filler = np.zeros(min(len(w) for w in wavs), dtype=np.float32)
            wavs = list(wavs) + [filler] * pad
        return wavs, pad

    def _device_batch(self, batch: np.ndarray, lens: np.ndarray):
        # optional int16 wire format: audio is 16-bit at the source
        # (``load_audio`` divides s16 by 32768), so quantizing back for the
        # host->device hop halves transfer bytes at <=1.5e-5 amplitude
        # error; the jitted forward dequantizes on device
        # (``_encode_impl``).  A PCIe-bandwidth knob for production hosts.
        if (self._int16_wire and isinstance(batch, np.ndarray)
                and batch.dtype == np.float32):
            batch = np.clip(np.rint(batch * 32768.0), -32768, 32767).astype(
                np.int16)
        b = jnp.asarray(batch)
        l = jnp.asarray(lens)
        if self.mesh is not None:
            b = jax.device_put(b, self._data_sharding)
            l = jax.device_put(l, self._data_sharding)
        return b, l

    def cast_encoder(self, dtype=jnp.bfloat16) -> None:
        """Cast encoder weights in place (reference ``fp16_encoder``:
        ``gigaam/__init__.py:188-189`` halves the encoder on GPU).  Halves
        HBM weight traffic per forward; heads stay fp32."""
        self.params["encoder"] = jax.tree.map(
            lambda x: x.astype(dtype)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            self.params["encoder"])

    # -- params ------------------------------------------------------------

    def init_params(self, key: jax.Array) -> Dict[str, Any]:
        k_enc, k_head = jax.random.split(key)
        params: Dict[str, Any] = {
            "encoder": init_encoder_params(k_enc, self.cfg.encoder)
        }
        head = self._init_head(k_head)
        if head is not None:
            params["head"] = head
        return params

    def _init_head(self, key: jax.Array) -> Optional[Dict[str, Any]]:
        return None

    # -- forward -----------------------------------------------------------

    def _encode_impl(self, params, wavs, lengths, pos):
        if wavs.dtype == jnp.int16:  # int16 wire format (``_device_batch``)
            wavs = wavs.astype(jnp.float32) * (1.0 / 32768.0)
        feats, feat_lens = self.frontend.forward(wavs, lengths)
        feats = jnp.transpose(feats, (0, 2, 1))  # [B, T, F]
        encoded, enc_lens, _ = conformer_forward(
            params["encoder"], feats, feat_lens, self.cfg.encoder, pos,
            compute_dtype=self.compute_dtype)
        return encoded, enc_lens

    def _pos_for_tfeat(self, t_feat: int):
        from ..ops.conformer_ops import static_subsampled_length

        t_sub = static_subsampled_length(
            t_feat, self.cfg.encoder.num_subsampling_stages,
            self.cfg.encoder.subs_kernel_size)
        if self.cfg.encoder.self_attention_model == "rotary":
            return self.pos_tables.rotary(t_sub)
        return self.pos_tables.relpos(t_sub)

    def _pos_for(self, padded_samples: int):
        return self._pos_for_tfeat(
            num_frames(padded_samples, self.cfg.preprocessor))

    def encode_batch(
        self, wavs: List[np.ndarray]
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Waveforms -> (encoded [B, T', D], enc_lens [B])."""
        n = len(wavs)
        wavs, _ = self._dp_pad(wavs)
        batch, lens = pad_wav_batch(wavs)
        pos = self._pos_for(batch.shape[1])
        b, l = self._device_batch(batch, lens)
        encoded, enc_lens = self._encode_jit(self.params, b, l, pos)
        return encoded[:n], enc_lens[:n]

    def prepare_wav(self, wav_file: Union[str, np.ndarray]) -> np.ndarray:
        """Path -> 16 kHz float waveform; in-memory arrays pass through
        (superset of reference ``model.py:47-55``, matching our
        ``transcribe_longform``, which already accepts arrays)."""
        if isinstance(wav_file, np.ndarray):
            return np.asarray(wav_file, dtype=np.float32)
        return load_audio(wav_file)

    def embed_audio(self, wav_file: str,
                    layout: str = "btd") -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Extract encoder representations (``gigaam/model.py:57-63``).

        Returns (encoded, enc_len [1]).  ``layout`` selects the embedding
        axis order — ``"btd"`` (default, [1, T', D]: this framework's
        native time-major layout) or ``"bdt"`` ([1, D, T']: the
        reference's return layout, for consumers porting code that
        indexes ``emb[:, :, t]``).  The default differs from the
        reference ON PURPOSE (time-major feeds every downstream op here
        without a transpose); pass ``layout="bdt"`` for drop-in parity.
        """
        if layout not in ("btd", "bdt"):
            raise ValueError(f"layout must be 'btd' or 'bdt', got {layout!r}")
        wav = self.prepare_wav(wav_file)
        encoded, enc_len = self.encode_batch([wav])
        if layout == "bdt":
            encoded = jnp.transpose(encoded, (0, 2, 1))
        return encoded, enc_len

    def to_exported(self, out_dir: str, **kw):
        """Serialize this model's serving graphs (StableHLO) to ``out_dir``.

        Convenience analogue of the reference's ``model.to_onnx``
        (``gigaam/model.py:65-71``); see ``gigaam_tpu.export.export_model``
        for bucket options and ``gigaam_tpu.exported_infer`` for running
        inference off the artifacts alone.
        """
        from ..export import export_model

        return export_model(self, out_dir, **kw)


class GigaAMASR(GigaAM):
    """ASR model with CTC or RNNT head (reference ``gigaam/model.py:86-259``)."""

    def __init__(self, cfg: ModelConfig, **kw):
        assert cfg.head is not None and cfg.decoding is not None
        vocab = cfg.decoding.vocabulary
        self.tokenizer = Tokenizer(vocab or [], cfg.decoding.model_path)
        super().__init__(cfg, **kw)
        self.blank_id = len(self.tokenizer)
        self._ctc_lp_jit = None
        self._align_jit = None  # built on first align() call
        if isinstance(cfg.head, CTCHeadConfig):
            self._asr_fwd = jax.jit(self._ctc_forward_impl)
            # built eagerly (the wrapper is free; compilation stays lazy):
            # a lazy None-check would race under the threaded server and
            # build two wrappers with separate compile caches
            self._ctc_lp_jit = jax.jit(self._ctc_logprobs_impl)

    def _init_head(self, key: jax.Array) -> Dict[str, Any]:
        head = self.cfg.head
        if isinstance(head, CTCHeadConfig):
            return heads_lib.init_ctc_head(key, head)
        assert isinstance(head, RNNTHeadConfig)
        return heads_lib.init_rnnt_head(key, head)

    # -- fused forward+decode paths ---------------------------------------

    def _ctc_forward_impl(self, params, wavs, lengths, pos):
        encoded, enc_lens = self._encode_impl(params, wavs, lengths, pos)
        log_probs = heads_lib.ctc_log_probs(params["head"], encoded)
        labels, keep = ctc_greedy_mask(log_probs, enc_lens)
        # argmax token's log-prob per frame: feeds per-word confidence
        # (max over V — free next to the argmax the mask already takes)
        tok_lp = jnp.max(log_probs, axis=-1).astype(jnp.float32)
        return labels, keep, tok_lp, enc_lens

    def _ctc_logprobs_impl(self, params, wavs, lengths, pos):
        """Full [B, T', V] posteriors — the prefix-beam decode input."""
        encoded, enc_lens = self._encode_impl(params, wavs, lengths, pos)
        log_probs = heads_lib.ctc_log_probs(params["head"], encoded)
        return log_probs.astype(jnp.float32), enc_lens

    def _resolve_lm(self, lm):
        """``lm``: NGramLM | npz path | None.  Returns (lm_obj, dev_spec)
        where dev_spec = (table on device, base, ctx_len) for the RNNT
        on-device beam (built once per LM object and cached)."""
        if lm is None:
            return None, None
        if isinstance(lm, str):
            from ..decode.lm import NGramLM

            path_cache = getattr(self, "_lm_path_cache", None)
            if path_cache is not None and path_cache[0] == lm:
                lm = path_cache[1]
            else:
                loaded = NGramLM.load(lm)
                self._lm_path_cache = (lm, loaded)
                lm = loaded
        if lm.vocab_size != len(self.tokenizer):
            raise ValueError(
                f"LM vocab_size {lm.vocab_size} != tokenizer vocab "
                f"{len(self.tokenizer)} — train the LM with this model's "
                f"tokenizer (tools/train_lm.py --model ...)")
        is_ctc = isinstance(self.cfg.head, CTCHeadConfig)
        if is_ctc:
            return lm, None  # host prefix beam scores through the object
        version = getattr(lm, "version", None)
        cached = getattr(self, "_lm_dev_cache", None)
        if (cached is not None and cached[0] is lm
                and cached[1] == version):
            return lm, cached[2]
        from ..decode.lm import _MAX_DENSE_ELEMS

        rows = (lm.vocab_size + 1) ** (lm.order - 1)
        if rows * lm.vocab_size <= _MAX_DENSE_ELEMS:
            table = jnp.asarray(lm.dense_table())   # one-gather fast path
        else:
            # counted-contexts-only table: SP vocabs get trigram+ fusion
            table = jax.tree.map(jnp.asarray, lm.sparse_table())
        spec = (table, lm.vocab_size + 1, lm.order - 1)
        self._lm_dev_cache = (lm, version, spec)
        return lm, spec

    def _decode_batch_submit(
        self, wavs: List[np.ndarray], word_timestamps: bool,
        beam_size: int = 1,
        pad_rows_to: int = 0,
        bucket: int = BUCKET_SAMPLES,
        lm=None, lm_weight: float = 0.5, token_bonus: float = 0.0,
    ):
        """Start the device work for a batch; returns ``finalize()``.

        The jit dispatch is asynchronous, so a caller may submit the next
        batch *before* finalizing this one — serving pipelines batches this
        way, overlapping device compute with the previous batch's readback
        and host-side decode.  ``finalize()`` blocks on the device results
        and returns the ``_decode_batch`` output list.

        ``bucket`` is the duration-bucket granularity in samples; the
        server passes a coarser value than the 1 s default to shrink the
        set of compiled graphs it must warm (padded frames are masked, so
        results are unchanged).

        ``lm`` enables n-gram shallow fusion in the beam decoders
        (``decode/lm.py``); it requires ``beam_size > 1``."""
        if lm is not None and beam_size <= 1:
            raise ValueError("LM shallow fusion requires beam_size > 1")
        lm, lm_spec = self._resolve_lm(lm)
        n = len(wavs)
        if pad_rows_to > n:
            filler = np.zeros(min(len(w) for w in wavs), np.float32)
            wavs = list(wavs) + [filler] * (pad_rows_to - n)
        wavs, _ = self._dp_pad(wavs)
        batch, lens = pad_wav_batch(wavs, bucket=bucket)
        pos = self._pos_for(batch.shape[1])
        dev_batch, dev_lens = self._device_batch(batch, lens)

        is_ctc = isinstance(self.cfg.head, CTCHeadConfig)
        if is_ctc and beam_size > 1:
            log_probs, enc_lens = self._ctc_lp_jit(
                self.params, dev_batch, dev_lens, pos)

            def decode_host():
                from ..decode.ctc_beam import ctc_beam_batch

                lp_np = tree_to_host(log_probs)[:n]
                pairs = ctc_beam_batch(lp_np,
                                       tree_to_host(enc_lens)[:n],
                                       beam_size=beam_size,
                                       lm=lm, lm_weight=lm_weight,
                                       token_bonus=token_bonus)
                # confidence proxy: the chosen token's posterior at its
                # emit frame (the beam's own sum-over-alignments score has
                # no per-token decomposition)
                return [
                    (ids, fr, [float(lp_np[b_, f, t_])
                               for t_, f in zip(ids, fr)])
                    for b_, (ids, fr) in enumerate(pairs)
                ]
        elif is_ctc:
            labels, keep, tok_lp, enc_lens = self._asr_fwd(
                self.params, dev_batch, dev_lens, pos)

            def decode_host():
                pairs = ctc_extract(tree_to_host(labels)[:n],
                                    tree_to_host(keep)[:n])
                lp_np = tree_to_host(tok_lp)[:n]
                return [(ids, fr, [float(lp_np[b_, f] ) for f in fr])
                        for b_, (ids, fr) in enumerate(pairs)]
        else:
            encoded, enc_lens = self._encode_jit(
                self.params, dev_batch, dev_lens, pos)
            if beam_size > 1:
                from ..decode.rnnt_beam import rnnt_beam_decode

                lm_kw = {}
                if lm_spec is not None:
                    table, base, ctx_len = lm_spec
                    lm_kw = dict(lm_table=table, lm_base=base,
                                 lm_ctx_len=ctx_len, lm_weight=lm_weight,
                                 token_bonus=token_bonus)
                tokens, frames, counts, logps = rnnt_beam_decode(
                    self.params["head"], encoded, enc_lens,
                    beam_size=beam_size,
                    max_symbols=self.cfg.decoding.max_symbols_per_step,
                    with_logps=True, **lm_kw)
            else:
                tokens, frames, counts, logps = rnnt_greedy_decode(
                    self.params["head"], encoded, enc_lens,
                    max_symbols=self.cfg.decoding.max_symbols_per_step,
                    with_logps=True)

            # both RNNT decoders are called with with_logps=True, so the
            # per-token log-probs are always present
            assert logps is not None

            def decode_host():
                pairs = rnnt_extract(tree_to_host(tokens)[:n],
                                     tree_to_host(frames)[:n],
                                     tree_to_host(counts)[:n])
                lp_np = tree_to_host(logps)[:n]
                return [
                    (ids, fr, lp_np[b_, :len(ids)].tolist())
                    for b_, (ids, fr) in enumerate(pairs)
                ]

        def finalize() -> List[Tuple[str, Optional[List[Word]]]]:
            decoded = decode_host()
            # tree_to_host, not np.asarray: under a multi-host mesh the
            # outputs span non-addressable devices and must be allgathered
            # (the same contract save_model relies on)
            enc_lens_np = tree_to_host(enc_lens)
            out: List[Tuple[str, Optional[List[Word]]]] = []
            for i, (ids, frames_i, logps_i) in enumerate(decoded):
                text = self.tokenizer.decode(ids)
                words = None
                if word_timestamps:
                    shift = compute_frame_shift(int(lens[i]),
                                                int(enc_lens_np[i]))
                    words = frames_to_words(self.tokenizer, ids, frames_i,
                                            shift, token_logps=logps_i)
                out.append((text, words))
            return out

        return finalize

    def _decode_batch(
        self, wavs: List[np.ndarray], word_timestamps: bool,
        beam_size: int = 1,
        pad_rows_to: int = 0,
        bucket: int = BUCKET_SAMPLES,
        lm=None, lm_weight: float = 0.5, token_bonus: float = 0.0,
    ) -> List[Tuple[str, Optional[List[Word]]]]:
        """Batched transcribe core (reference ``model.py:96-124``).

        ``beam_size > 1`` switches RNNT models to the on-device beam
        search (``decode/rnnt_beam.py``) and CTC models to host prefix
        beam search over the full posteriors (``decode/ctc_beam.py``) —
        both extensions over the greedy-only reference.

        ``pad_rows_to`` pads the device batch's row count (serving uses it
        to keep one compiled graph per duration bucket); filler rows are
        dropped before any host-side decode work.

        Under ``set_mesh``, the batch is sharded across the mesh "data"
        axis — the multi-chip longform path."""
        return self._decode_batch_submit(wavs, word_timestamps,
                                         beam_size=beam_size,
                                         pad_rows_to=pad_rows_to,
                                         bucket=bucket, lm=lm,
                                         lm_weight=lm_weight,
                                         token_bonus=token_bonus)()

    # -- public API --------------------------------------------------------

    def transcribe(
        self, wav_file: str, word_timestamps: bool = False,
        beam_size: int = 1,
        lm=None, lm_weight: float = 0.5, token_bonus: float = 0.0,
    ) -> TranscriptionResult:
        """Transcribe a short (<25 s) audio file (``model.py:126-140``).

        ``beam_size > 1`` enables RNNT beam search (an extension over the
        reference, which is greedy-only).  ``lm`` (an ``NGramLM`` or a
        saved-LM path) adds n-gram shallow fusion with weight
        ``lm_weight`` and per-token insertion bonus ``token_bonus``."""
        wav = self.prepare_wav(wav_file)
        if len(wav) > LONGFORM_THRESHOLD_SEC * SAMPLE_RATE:
            raise ValueError(
                "Too long wav file, use 'transcribe_longform' method.")
        text, words = self._decode_batch([wav], word_timestamps,
                                         beam_size=beam_size, lm=lm,
                                         lm_weight=lm_weight,
                                         token_bonus=token_bonus)[0]
        return TranscriptionResult(text=text, words=words)

    def align(self, wav_file: Union[str, np.ndarray],
              text: str) -> TranscriptionResult:
        """CTC forced alignment: word timestamps for a KNOWN transcript.

        Viterbi over the blank-interleaved target lattice
        (``decode/align.py``) — the most probable CTC path that emits
        exactly ``text``; each Word carries its aligned [start, end) span
        and ``confidence = exp(mean frame posterior)`` over the frames the
        path occupies it.  An extension over the reference (which has no
        alignment surface); standard uses: subtitle timing, corpus
        segmentation, keyword audit.  CTC models only (the RNNT lattice
        has no per-frame token states to align).

        Raises ``ValueError`` when the transcript cannot fit the audio
        (more CTC states than encoder frames, or a -inf path).
        """
        return self.align_batch([wav_file], [text])[0]

    def align_batch(self, wav_files: List[Union[str, np.ndarray]],
                    texts: List[str]) -> List[TranscriptionResult]:
        """Batched :meth:`align`: one encoder forward for the whole batch,
        the Viterbi DP ``vmap``-ed over samples (targets pad to a shared
        bucket so one compiled graph serves the batch)."""
        if self._ctc_lp_jit is None:
            raise ValueError("align() requires a CTC model "
                             "(v*_ctc / e2e_ctc); RNNT has no frame-level "
                             "alignment lattice")
        if len(wav_files) != len(texts):
            raise ValueError(f"{len(wav_files)} wavs vs {len(texts)} texts")
        if not wav_files:
            return []
        in_wavs = [self.prepare_wav(w) for w in wav_files]
        for i, w in enumerate(in_wavs):
            if len(w) > LONGFORM_THRESHOLD_SEC * SAMPLE_RATE:
                raise ValueError(
                    f"wav {i} too long for align(): VAD-segment it first "
                    "(transcribe_longform covers unknown-transcript audio)")
        # the training pipeline's reference normalization (ё->е, lowercase,
        # whitespace squeeze, vocab filter — ``data.py::normalize_text``)
        # makes real-world transcripts alignable against the char vocab
        # (which has no 'ё'); SP models then Viterbi-segment the result
        from ..data import normalize_text

        vocab = self.cfg.decoding.vocabulary if self.tokenizer.charwise \
            else None
        ids_list = [self.tokenizer.encode(
            normalize_text(t, vocab, raw_text=True)) for t in texts]

        from ..decode.align import backtrack, pad_targets, viterbi_align

        n = len(in_wavs)
        wavs, _ = self._dp_pad(in_wavs)
        batch, lens = pad_wav_batch(wavs)
        pos = self._pos_for(batch.shape[1])
        dev_batch, dev_lens = self._device_batch(batch, lens)
        log_probs, enc_lens = self._ctc_lp_jit(self.params, dev_batch,
                                               dev_lens, pos)
        if self._align_jit is None:
            self._align_jit = jax.jit(
                jax.vmap(viterbi_align, in_axes=(0, 0, 0, 0, None)))
        per_sample = [pad_targets(ids) for ids in ids_list]
        u_pad = max(t.shape[0] for t in per_sample)
        targets = np.zeros((n, u_pad), np.int32)
        for i, t in enumerate(per_sample):
            targets[i, :t.shape[0]] = t
        tlens = np.asarray([len(ids) for ids in ids_list], np.int32)
        bp, final_state, scores = self._align_jit(
            log_probs[:n], enc_lens[:n], jnp.asarray(targets),
            jnp.asarray(tlens), np.int32(self.blank_id))
        enc_lens_np = tree_to_host(enc_lens)
        scores_np = np.asarray(tree_to_host(scores))
        bad = [i for i in range(n)
               if len(ids_list[i])
               and (not np.isfinite(scores_np[i]) or scores_np[i] <= -1e29)]
        if bad:
            raise ValueError(
                f"transcript does not fit the audio for sample(s) {bad}: "
                f"more CTC states than encoder frames "
                f"({[(len(ids_list[i]), int(enc_lens_np[i])) for i in bad]}"
                f" as (tokens, frames))")
        bp_np = np.asarray(tree_to_host(bp))
        fs_np = np.asarray(tree_to_host(final_state))
        lp_np = np.asarray(tree_to_host(log_probs))
        out: List[TranscriptionResult] = []
        for i, ids in enumerate(ids_list):
            if not ids:
                out.append(TranscriptionResult(text="", words=[]))
                continue
            enc_len = int(enc_lens_np[i])
            frames, logps = backtrack(bp_np[i], int(fs_np[i]), enc_len,
                                      len(ids), lp_np[i], targets[i])
            shift = compute_frame_shift(int(lens[i]), enc_len)
            out.append(TranscriptionResult(
                text=self.tokenizer.decode(ids),
                words=frames_to_words(self.tokenizer, ids, frames, shift,
                                      token_logps=logps)))
        return out

    def transcribe_longform(
        self,
        wav_file: Union[str, np.ndarray],
        word_timestamps: bool = False,
        fr_batch_size: int = 16,
        beam_size: int = 1,
        bucket: int = BUCKET_SAMPLES,
        lm=None, lm_weight: float = 0.5, token_bonus: float = 0.0,
        **kwargs,
    ) -> LongformTranscriptionResult:
        """VAD-segment + batched transcription (``model.py:195-259``).

        ``bucket``: duration-bucket granularity in samples for the chunk
        batches (the server coarsens it to bound the warm graph set)."""
        from ..vad import segment_audio_file

        segments, boundaries = segment_audio_file(wav_file, SAMPLE_RATE,
                                                  **kwargs)
        if not segments:
            return LongformTranscriptionResult(segments=[])

        # pipeline chunk batches with a bounded lookahead: batch i+1's
        # device work dispatches (async) before batch i's readback + host
        # decode, while only 2 batches are ever in flight — submitting ALL
        # up front would pin O(hours/25s) input+output buffers in HBM.
        # Row counts pad to fr_batch_size so one compiled graph exists per
        # duration bucket.
        starts = list(range(0, len(segments), fr_batch_size))

        def submit(i: int):
            return (i, self._decode_batch_submit(
                segments[i: i + fr_batch_size], word_timestamps,
                beam_size=beam_size, pad_rows_to=fr_batch_size,
                bucket=bucket, lm=lm, lm_weight=lm_weight,
                token_bonus=token_bonus))

        from collections import deque

        inflight = deque([submit(starts[0])])
        result_segments: List[Segment] = []
        for k in range(len(starts)):
            if k + 1 < len(starts):
                inflight.append(submit(starts[k + 1]))
            i, finalize = inflight.popleft()
            for j, (text, words) in enumerate(finalize()):
                seg_start, seg_end = boundaries[i + j]
                if word_timestamps:
                    words = [w.shifted(seg_start) for w in words or []]
                    result_segments.append(Segment(
                        text=text, start=seg_start, end=seg_end, words=words))
                else:
                    result_segments.append(Segment(
                        text=text, start=seg_start, end=seg_end))
        return LongformTranscriptionResult(segments=result_segments)


class GigaAMEmo(GigaAM):
    """Emotion recognition model (reference ``gigaam/model.py:262-317``)."""

    def __init__(self, cfg: ModelConfig, **kw):
        assert isinstance(cfg.head, EmoHeadConfig)
        super().__init__(cfg, **kw)
        self.id2name = cfg.id2name or [
            str(i) for i in range(cfg.head.num_classes)]
        self._probs_jit = jax.jit(self._probs_impl)

    def _init_head(self, key: jax.Array) -> Dict[str, Any]:
        return heads_lib.init_emo_head(key, self.cfg.head)

    def _probs_impl(self, params, wavs, lengths, pos):
        encoded, enc_lens = self._encode_impl(params, wavs, lengths, pos)
        return heads_lib.emo_probs(params["head"], encoded, enc_lens)

    def get_probs(self, wav_file: str) -> Dict[str, float]:
        wav = self.prepare_wav(wav_file)
        batch, lens = pad_wav_batch([wav])
        pos = self._pos_for(batch.shape[1])
        probs = np.asarray(self._probs_jit(
            self.params, jnp.asarray(batch), jnp.asarray(lens), pos))[0]
        return {self.id2name[i]: float(probs[i]) for i in range(len(probs))}


# ---------------------------------------------------------------------------
# Save / load of native artifacts
# ---------------------------------------------------------------------------

def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def tree_to_host(tree):
    """Pytree of (possibly multi-host-sharded) arrays -> host numpy.

    Per-leaf, because the two cases need opposite handling (verified in a
    real 2-process ``jax.distributed`` run, ``tests/test_multihost.py``):

    * fully-addressable leaves (single host, or replicated across hosts):
      ``np.asarray`` reads them directly — ``process_allgather`` would
      instead treat them as process-local data and CONCATENATE the copies;
    * non-fully-addressable leaves (sharded over a multi-host mesh): must
      be allgathered with ``tiled=True`` (the default stacking mode raises
      for global arrays).  This is a collective: every process must call.
    """
    def leaf(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(
                x, tiled=True))
        return np.asarray(x)

    return jax.tree.map(leaf, tree)


def save_model(model: GigaAM, path: str) -> None:
    """Save params (npz) + config (json) as a native artifact pair.

    Self-contained: a sentencepiece tokenizer is copied next to the npz and
    stored as a *relative* path, so the artifact survives moving to another
    host/dir or cleaning the download cache (``load_native`` resolves it;
    same convention as ``export_model``).

    Multi-host safe: a collective gather brings sharded params to every
    host, then only process 0 writes (call from all processes).
    """
    params = tree_to_host(model.params)
    if jax.process_index() != 0:
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    base = path[:-4] if path.endswith(".npz") else path
    np.savez(base + ".npz", **_flatten(params))

    cfg = model.cfg
    dec = getattr(cfg, "decoding", None)
    if dec is not None and dec.model_path:
        import dataclasses
        import shutil

        tok_name = os.path.basename(base) + "_tokenizer.model"
        tok_dst = os.path.join(os.path.dirname(base) or ".", tok_name)
        # cfg.decoding.model_path is cwd-relative or absolute (load_native
        # already rebased artifact-bundled paths when the model was loaded);
        # resolving it against the DESTINATION dir would break both cases
        src = os.path.abspath(dec.model_path)
        if src != os.path.abspath(tok_dst):
            shutil.copyfile(src, tok_dst)
        cfg = dataclasses.replace(
            cfg, decoding=dataclasses.replace(dec, model_path=tok_name))
    with open(base + ".json", "w") as f:
        f.write(cfg.to_json())


def migrate_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Upgrade legacy param layouts to the current schema.

    Early artifacts stored the conv module's GLU projection as ONE fused
    ``pointwise_conv1 {w [.., d, 2d], b [.., 2d]}``; the current layout
    keeps value/gate halves as separate leaves so tensor-parallel sharding
    never splits an (a_i, g_i) pair across devices (docs/PERF.md)."""
    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if k == "pointwise_conv1" and isinstance(v, dict) and "w" in v:
                w = v["w"]
                c = w.shape[-1] // 2
                nv = {"w_value": w[..., :c], "w_gate": w[..., c:]}
                if "b" in v:
                    nv["b_value"] = v["b"][..., :c]
                    nv["b_gate"] = v["b"][..., c:]
                out[k] = nv
            else:
                out[k] = walk(v)
        return out

    return walk(params)


def load_params_npz(path: str) -> Dict[str, Any]:
    with np.load(path) as z:
        return migrate_params(_unflatten({k: z[k] for k in z.files}))


def model_class_for(cfg: ModelConfig):
    return {"ssl": GigaAM, "asr": GigaAMASR, "emo": GigaAMEmo}[cfg.model_class]


def load_native(path: str, **kw) -> GigaAM:
    """Load a ``save_model`` artifact (.npz + .json)."""
    base = path[:-4] if path.endswith(".npz") else path
    with open(base + ".json") as f:
        cfg = ModelConfig.from_dict(json.load(f))
    dec = getattr(cfg, "decoding", None)
    if (dec is not None and dec.model_path
            and not os.path.isabs(dec.model_path)):
        # bundled tokenizer: stored relative to the artifact dir
        import dataclasses

        cfg = dataclasses.replace(cfg, decoding=dataclasses.replace(
            dec, model_path=os.path.join(os.path.dirname(base) or ".",
                                         dec.model_path)))
    params = load_params_npz(base + ".npz")
    return model_class_for(cfg)(cfg, params=params, **kw)


def init_encoder_from_artifact(model: GigaAM, path: str) -> None:
    """SSL -> ASR handoff: replace ``model``'s encoder params with those of
    another native artifact (typically a BEST-RQ pretrained SSL encoder
    from ``train/pretrain.py``), leaving head/frontend untouched.

    This is the point of the reference's SSL family — every ``v*_ssl``
    checkpoint exists to be fine-tuned into CTC/RNNT models
    (``gigaam/__init__.py:28-41``; README "SSL -> fine-tuned" lineage).
    The reference relies on loading an SSL ckpt's encoder weights into the
    ASR model by state-dict name overlap; here the artifact's encoder
    subtree is grafted wholesale after an explicit architecture check.

    Raises ValueError on encoder-config mismatch (anything but runtime
    kernel flags) or a missing/incompatible encoder param tree.
    """
    import dataclasses

    base = path[:-4] if path.endswith(".npz") else path
    with open(base + ".json") as f:
        src_cfg = ModelConfig.from_dict(json.load(f))
    ours = dataclasses.asdict(model.cfg.encoder)
    theirs = dataclasses.asdict(src_cfg.encoder)
    # runtime/training knobs that do not shape the parameter tree: an SSL
    # artifact saved under a different kernel choice, remat setting, or
    # positional-table floor still grafts cleanly
    for runtime_flag in ("flash_attn", "activation_checkpointing",
                         "remat_policy", "pos_emb_max_len"):
        ours.pop(runtime_flag, None)
        theirs.pop(runtime_flag, None)
    if ours != theirs:
        diff = {k: (theirs.get(k), ours.get(k))
                for k in set(ours) | set(theirs)
                if theirs.get(k) != ours.get(k)}
        raise ValueError(
            f"encoder architecture mismatch between {path} and "
            f"{model.cfg.model_name} (artifact vs model): {diff}")
    src = load_params_npz(base + ".npz")
    if "encoder" not in src:
        raise ValueError(f"{path} has no encoder params")
    try:
        # tree_map over (dst, src) both validates identical structure and
        # preserves the model's param dtypes (fp32 masters for training)
        enc = jax.tree.map(lambda dst, s: jnp.asarray(s, dst.dtype),
                           model.params["encoder"], src["encoder"])
    except ValueError as e:
        raise ValueError(
            f"encoder param tree of {path} does not match the model "
            f"(artifact saved by an incompatible version?): {e}") from e
    model.params = dict(model.params, encoder=enc)
