#!/usr/bin/env python
"""Streaming latency/throughput benchmark.

Measures, for ``--streams`` concurrent simulated real-time streams against
one StreamingTranscriber each (library-level; add --http to go through a
live server's /transcribe_stream instead):

* per-stride decode wall time (the work done every ``stride_s`` of audio);
* stream real-time factor: how many x real time one stride decode runs
  (stride_s / decode_s) — the per-chip concurrent-stream capacity bound;
* commit lag: seconds between a word's audio END and the moment it is
  committed (policy floor = ~2 strides + right margin + one word).

Usage (on the TPU host):
    python benchmarks/streaming_bench.py --model v3_ctc --minutes 2
    python benchmarks/streaming_bench.py --model v3_ctc --http \
        --url http://127.0.0.1:8000
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import gigaam_tpu
from gigaam_tpu.streaming import StreamingTranscriber


def synth_audio(seconds: float, seed: int = 0) -> np.ndarray:
    """Tone bursts with pauses — gives the energy/word machinery edges."""
    sr = gigaam_tpu.SAMPLE_RATE
    rng = np.random.default_rng(seed)
    pieces = []
    t_left = seconds
    while t_left > 0:
        burst = min(3.0, t_left)
        t = np.arange(int(sr * burst)) / sr
        f = float(rng.uniform(200, 400))
        pieces.append((0.3 * np.sin(2 * np.pi * f * t)
                       + 0.05 * rng.standard_normal(t.size)))
        pieces.append(np.zeros(int(0.4 * sr)))
        t_left -= burst + 0.4
    return np.concatenate(pieces).astype(np.float32)


def run_library(model, wav: np.ndarray, stride_s: float) -> dict:
    st = StreamingTranscriber(model, stride_s=stride_s)
    sr = gigaam_tpu.SAMPLE_RATE
    step = int(stride_s * sr)
    decode_times, commit_lags = [], []
    # warm the bucket graphs once so the steady state is measured
    st.push(wav[:step])
    for i in range(step, len(wav), step):
        t0 = time.perf_counter()
        events = st.push(wav[i: i + step])
        dt = time.perf_counter() - t0
        decode_times.append(dt)
        now_audio = (i + step) / sr  # stream-clock position
        for ev in events:
            if ev.kind == "committed":
                commit_lags.extend(now_audio - w.end for w in ev.words)
    st.flush()
    med = float(np.median(decode_times)) if decode_times else 0.0
    return {
        "stride_s": stride_s,
        "median_decode_ms": round(med * 1e3, 2),
        "p95_decode_ms": round(float(np.percentile(decode_times, 95)) * 1e3,
                               2) if decode_times else 0.0,
        "stream_rtf": round(stride_s / med, 1) if med else 0.0,
        "median_commit_lag_s": round(float(np.median(commit_lags)), 2)
        if commit_lags else None,
        "n_committed_words": len(commit_lags),
    }


def run_quality(model, wav: np.ndarray, stride_s: float) -> dict:
    """Streaming-committed vs offline WER — what LocalAgreement costs.

    The offline decode of the SAME audio by the SAME model is the ground
    truth (with real weights it is the reference-parity transcript; with
    random weights it still pins policy regressions: any word the
    streaming policy drops or mangles shows up as an error).  Long audio
    goes through transcribe_longform; short audio through transcribe.
    """
    from gigaam_tpu.metrics import wer

    sr = gigaam_tpu.SAMPLE_RATE
    if len(wav) <= 25 * sr:
        offline = model.transcribe(wav).text
    else:
        offline = model.transcribe_longform(wav).text
    st = StreamingTranscriber(model, stride_s=stride_s)
    step = int(stride_s * sr)
    for i in range(0, len(wav), step):
        st.push(wav[i: i + step])
    st.flush()
    streamed = st.text
    ow, sw = offline.split(), streamed.split()
    return {
        "streaming_vs_offline_wer": round(wer([streamed], [offline]), 4),
        "offline_words": len(ow),
        "streaming_words": len(sw),
        "word_count_delta": len(sw) - len(ow),
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="v3_ctc")
    ap.add_argument("--init", default="random",
                    help="'weights' to download/convert the real ckpt")
    ap.add_argument("--minutes", type=float, default=2.0)
    ap.add_argument("--stride_s", type=float, default=2.0)
    ap.add_argument("--download_root", default=None,
                    help="checkpoint cache dir (default ~/.cache/gigaam_tpu)")
    ap.add_argument("--http", action="store_true",
                    help="benchmark through a running server instead")
    ap.add_argument("--url", default="http://127.0.0.1:8000")
    ap.add_argument("--no_quality", action="store_true",
                    help="skip the streaming-vs-offline WER section")
    args = ap.parse_args()

    wav = synth_audio(args.minutes * 60.0)
    if args.http:
        from gigaam_tpu.client import transcribe_stream

        t0 = time.perf_counter()
        events = transcribe_stream(args.url, wav, chunk_s=args.stride_s)
        wall = time.perf_counter() - t0
        out = {"mode": "http", "events": len(events),
               "wall_s": round(wall, 2),
               "rtf": round(args.minutes * 60.0 / wall, 1)}
    else:
        model = gigaam_tpu.load_model(args.model, init=args.init,
                                      download_root=args.download_root)
        out = {"mode": "library", "model": args.model,
               **run_library(model, wav, args.stride_s)}
        if not args.no_quality:
            out.update(run_quality(model, wav, args.stride_s))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
