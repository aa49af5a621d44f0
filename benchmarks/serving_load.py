#!/usr/bin/env python
"""HTTP serving load benchmark: concurrent shortform bursts.

Starts the batching server in-process, fires ``--requests`` concurrent
10 s clips from a thread pool, and reports end-to-end serving RTF.
Run the clients from another machine/process for GIL-free numbers; the
in-process measurement here is within ~10% of out-of-process on the dev
setup (docs/PERF.md).

Usage:  python benchmarks/serving_load.py [--requests 64] [--seconds 10]
"""

from __future__ import annotations

import argparse
import concurrent.futures as cf
import io
import json
import os
import sys
import threading
import time
import urllib.request
import wave
from http.server import ThreadingHTTPServer

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--seconds", type=int, default=10)
    ap.add_argument("--max_batch", type=int, default=8)
    ap.add_argument("--concurrency", type=int, default=32)
    ap.add_argument("--model", default="ctc")
    args = ap.parse_args()

    import gigaam_tpu
    from gigaam_tpu.serve import ASRHTTPServer, BatchingASRServer, make_handler

    sr = gigaam_tpu.SAMPLE_RATE
    model = gigaam_tpu.load_model(args.model, init="random")
    server = BatchingASRServer(model, max_batch=args.max_batch)
    print(f"warming [{args.max_batch} x {args.seconds}s]...", flush=True)
    server.warmup([args.seconds])
    httpd = ASRHTTPServer(("127.0.0.1", 0), make_handler(server))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_port}/transcribe"

    rng = np.random.default_rng(0)

    def wav_bytes() -> bytes:
        pcm = np.clip(np.rint(
            0.1 * rng.standard_normal(sr * args.seconds) * 32768),
            -32768, 32767).astype("<i2")
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(sr)
            wf.writeframes(pcm.tobytes())
        return buf.getvalue()

    bodies = [wav_bytes() for _ in range(args.max_batch)]

    def post(i: int):
        req = urllib.request.Request(
            url, data=bodies[i % len(bodies)],
            headers={"Content-Type": "audio/wav"})
        with urllib.request.urlopen(req, timeout=300) as r:
            return json.loads(r.read())

    post(0)  # warm the HTTP path
    t0 = time.perf_counter()
    with cf.ThreadPoolExecutor(max_workers=args.concurrency) as pool:
        results = list(pool.map(post, range(args.requests)))
    dt = time.perf_counter() - t0
    assert all("text" in r for r in results)
    audio = args.requests * args.seconds
    print(f"{args.requests} x {args.seconds}s concurrent: {dt:.2f}s wall "
          f"-> serving RTF {audio / dt:.0f}x")

    httpd.shutdown()
    server.shutdown()


if __name__ == "__main__":
    main()
