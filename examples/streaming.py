#!/usr/bin/env python
"""Streaming (incremental) transcription walkthrough.

Simulates a live microphone by pushing a waveform in 0.5 s chunks;
committed text is stable (never retracted), the partial tail updates as
audio arrives.  Runs offline with a tiny random model — swap in
``gigaam_tpu.load_model("v3_ctc")`` for real transcripts.

Server-side equivalent: POST chunked s16le PCM to ``/transcribe_stream``
(see ``gigaam_tpu.serve``; ``gigaam_tpu.client.transcribe_stream`` is the
client helper).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import gigaam_tpu
from gigaam_tpu.config import (CTCHeadConfig, DecodingConfig, EncoderConfig,
                               FeaturesConfig, ModelConfig, RU_VOCAB)
from gigaam_tpu.models.model import GigaAMASR


def tiny_model() -> GigaAMASR:
    cfg = ModelConfig(
        model_name="demo_ctc", model_class="asr",
        preprocessor=FeaturesConfig(),
        encoder=EncoderConfig(n_layers=2, d_model=64, n_heads=4,
                              ff_expansion_factor=2, conv_kernel_size=7,
                              pos_emb_max_len=512),
        head=CTCHeadConfig(feat_in=64, num_classes=len(RU_VOCAB) + 1),
        decoding=DecodingConfig(kind="ctc_greedy", vocabulary=list(RU_VOCAB)))
    return GigaAMASR(cfg, seed=0)


def main() -> None:
    model = tiny_model()
    rng = np.random.default_rng(0)
    t = np.arange(12 * gigaam_tpu.SAMPLE_RATE) / gigaam_tpu.SAMPLE_RATE
    wav = (0.3 * np.sin(2 * np.pi * 300 * t)
           + 0.05 * rng.standard_normal(t.size)).astype(np.float32)

    for ev in gigaam_tpu.stream_file(model, wav, chunk_s=0.5,
                                     window_s=20.0, stride_s=2.0):
        tag = "FINAL " if ev.kind == "committed" else "      "
        print(f"{tag}[{ev.kind}] {ev.text!r}")


if __name__ == "__main__":
    main()
