#!/usr/bin/env python
"""Longform wall-clock benchmark: synthetic speech -> transcribe_longform.

Measures the end-to-end pipeline (host VAD + pipelined chunk batches +
decode) at 10 minutes by default; ``--minutes 60`` reproduces the
one-hour scale check from docs/PERF.md.

Usage:  python benchmarks/longform_bench.py [--minutes 10] [--model ctc]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def synth_speech(minutes: float, sr: int) -> np.ndarray:
    """Tone bursts (2-8 s) with 0.4-1.5 s silences — enough structure for
    the energy VAD to find boundaries."""
    rng = np.random.default_rng(0)
    target = int(minutes * 60 * sr)
    parts, total = [], 0
    while total < target:
        n = int(rng.uniform(2.0, 8.0) * sr)
        t = np.arange(n) / sr
        burst = (0.25 * np.sin(2 * np.pi * rng.uniform(120, 300) * t)
                 * (0.6 + 0.4 * np.sin(2 * np.pi * 3.1 * t))
                 ).astype(np.float32)
        sil = np.zeros(int(rng.uniform(0.4, 1.5) * sr), np.float32)
        parts += [burst, sil]
        total += len(burst) + len(sil)
    return np.concatenate(parts)[:target]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=10.0)
    ap.add_argument("--model", default="ctc")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import gigaam_tpu

    sr = gigaam_tpu.SAMPLE_RATE
    wav = synth_speech(args.minutes, sr)
    audio_sec = len(wav) / sr
    model = gigaam_tpu.load_model(args.model, init="random")

    t0 = time.perf_counter()
    res = model.transcribe_longform(wav)
    print(f"cold (incl. compiles): {time.perf_counter() - t0:.2f}s  "
          f"({len(res.segments)} segments)")

    best = float("inf")
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        res = model.transcribe_longform(wav)
        best = min(best, time.perf_counter() - t0)
    print(f"warm best of {args.repeats}: {best:.2f}s  "
          f"wall RTF {audio_sec / best:.0f}x  "
          f"({len(res.segments)} segments)")


if __name__ == "__main__":
    main()
