#!/usr/bin/env python
"""Multi-stream serving capacity: N concurrent real-time /transcribe_stream
clients (+ optional background shortform traffic) against the in-process
batching server.

Extends ``serving_load.py`` (shortform burst RTF) with the round-4 verdict's
missing number: how per-stream stride latency degrades as concurrent streams
contend for the shared dynamic-batching queue and the ``stream_slots``
semaphore (serve.py defaults to 4).

Each stream uploads s16le PCM paced at REAL TIME (chunk k is sent at
``t0 + k * chunk_s``, i.e. at the chunk's START time) and a reader thread
timestamps every NDJSON event on arrival.  The server emits exactly one
``partial`` event per stride (streaming.py::push); the k-th stride's last
chunk is sent at ``t0 + (k+1) * stride_s - chunk_s``, so its service
latency (queueing + decode + emission behind the triggering chunk) is::

    lat_k = t_arrival(partial k) - (t0 + (k+1) * stride_s - chunk_s)
Reported per stream count: p50/p95 stride latency, commit counts, and — when
``--bg_rps`` > 0 — p50/p95 latency of the background shortform requests that
share the device queue.

Usage:  python benchmarks/serving_stream_capacity.py
            [--streams 1,2,4] [--stream_seconds 45] [--bg_rps 2]
            [--json out.json]
"""

from __future__ import annotations

import argparse
import concurrent.futures as cf
import http.client
import json
import os
import sys
import threading
import time
from http.server import ThreadingHTTPServer  # noqa: F401 (doc parity)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

STRIDE_S = 2.0  # streaming.py::StreamingTranscriber default


def synth_audio(seconds: float, seed: int):
    """Speech-like synthetic audio (tone bursts + pauses) so the energy
    VAD and the decoder see structure; content quality is irrelevant for a
    latency benchmark."""
    import gigaam_tpu

    sr = gigaam_tpu.SAMPLE_RATE
    rng = np.random.default_rng(seed)
    out = np.zeros(int(seconds * sr), np.float32)
    pos = 0
    while pos < len(out):
        dur = int(rng.uniform(0.2, 0.6) * sr)
        f = rng.uniform(120, 400)
        t = np.arange(min(dur, len(out) - pos))
        out[pos:pos + len(t)] = 0.25 * np.sin(2 * np.pi * f * t / sr)
        pos += dur + int(rng.uniform(0.05, 0.3) * sr)
    return out


def run_stream(port: int, wav: np.ndarray, chunk_s: float, sid: int):
    """One paced stream; returns dict with event timings."""
    import gigaam_tpu

    sr = gigaam_tpu.SAMPLE_RATE
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
    conn.putrequest("POST", "/transcribe_stream")
    conn.putheader("Content-Type", "audio/l16")
    conn.putheader("Transfer-Encoding", "chunked")
    conn.endheaders()

    events = []                       # (arrival_time, kind)
    status = {}

    def reader():
        try:
            resp = conn.getresponse()
            status["code"] = resp.status
            buf = b""
            while True:
                piece = resp.read1(65536)
                if not piece:
                    break
                buf += piece
                while b"\n" in buf:
                    line, buf = buf.split(b"\n", 1)
                    if line.strip():
                        ev = json.loads(line)
                        events.append((time.perf_counter(), ev.get("kind")))
        except Exception as exc:  # pragma: no cover - diagnostics only
            status["exc"] = repr(exc)

    rt = threading.Thread(target=reader, daemon=True)
    rt.start()

    pcm = np.clip(np.rint(wav * 32768), -32768, 32767).astype("<i2").tobytes()
    step = int(chunk_s * sr) * 2
    t0 = time.perf_counter()
    for k, off in enumerate(range(0, len(pcm), step)):
        target = t0 + k * chunk_s
        now = time.perf_counter()
        if target > now:
            time.sleep(target - now)
        piece = pcm[off:off + step]
        conn.send(f"{len(piece):X}\r\n".encode() + piece + b"\r\n")
    conn.send(b"0\r\n\r\n")
    rt.join(timeout=120)
    conn.close()

    partials = [t for t, kind in events if kind == "partial"]
    lats = [t - (t0 + (k + 1) * STRIDE_S - chunk_s)
            for k, t in enumerate(partials)]
    return {
        "sid": sid,
        "status": status.get("code"),
        "events": len(events),
        "partials": len(partials),
        "commits": sum(1 for _, k in events if k == "committed"),
        "stride_lat": lats,
        "error": status.get("exc"),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", default="1,2,4")
    ap.add_argument("--stream_seconds", type=float, default=45.0)
    ap.add_argument("--chunk_s", type=float, default=0.5)
    ap.add_argument("--bg_rps", type=float, default=2.0,
                    help="background shortform requests/s (0 = none)")
    ap.add_argument("--bg_seconds", type=int, default=10)
    ap.add_argument("--model", default="ctc")
    ap.add_argument("--max_batch", type=int, default=8)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import gigaam_tpu
    from gigaam_tpu.serve import ASRHTTPServer, BatchingASRServer, make_handler

    sr = gigaam_tpu.SAMPLE_RATE
    model = gigaam_tpu.load_model(args.model, init="random")
    server = BatchingASRServer(model, max_batch=args.max_batch)
    print("warming...", flush=True)
    # streams decode rolling buffers bucketed up to the 20 s window, plus
    # the background shortform bucket
    server.warmup(sorted({5, 10, 15, 20, args.bg_seconds}))
    httpd = ASRHTTPServer(("127.0.0.1", 0), make_handler(server))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    port = httpd.server_port

    import io
    import urllib.request
    import wave

    rng = np.random.default_rng(7)
    pcm_bg = np.clip(np.rint(
        0.1 * rng.standard_normal(sr * args.bg_seconds) * 32768),
        -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(pcm_bg.tobytes())
    bg_body = buf.getvalue()

    def bg_post():
        t0 = time.perf_counter()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/transcribe", data=bg_body,
            headers={"Content-Type": "audio/wav"})
        with urllib.request.urlopen(req, timeout=300) as r:
            json.loads(r.read())
        return time.perf_counter() - t0

    bg_post()  # warm HTTP path

    def pct(xs, p):
        return round(float(np.percentile(xs, p)), 3) if xs else None

    from gigaam_tpu.serve import STREAM_SLOTS

    results = {"stride_s": STRIDE_S, "stream_slots": STREAM_SLOTS,
               "bg_rps": args.bg_rps, "runs": {}}
    for n in [int(x) for x in args.streams.split(",")]:
        wavs = [synth_audio(args.stream_seconds, seed=i) for i in range(n)]
        stop_bg = threading.Event()
        bg_lats = []

        def bg_loop():
            while not stop_bg.is_set():
                t0 = time.perf_counter()
                try:
                    bg_lats.append(bg_post())
                except Exception:
                    bg_lats.append(float("nan"))
                rest = 1.0 / args.bg_rps - (time.perf_counter() - t0)
                if rest > 0:
                    stop_bg.wait(rest)

        bg_thread = None
        if args.bg_rps > 0:
            bg_thread = threading.Thread(target=bg_loop, daemon=True)
            bg_thread.start()

        with cf.ThreadPoolExecutor(max_workers=n) as pool:
            outs = list(pool.map(
                lambda i: run_stream(port, wavs[i], args.chunk_s, i),
                range(n)))
        if bg_thread:
            stop_bg.set()
            bg_thread.join(timeout=10)

        all_lats = [x for o in outs for x in o["stride_lat"]]
        run = {
            "streams": n,
            "ok": all(o["status"] == 200 and not o["error"] for o in outs),
            "partials_per_stream": [o["partials"] for o in outs],
            "commits_per_stream": [o["commits"] for o in outs],
            "stride_lat_p50_s": pct(all_lats, 50),
            "stride_lat_p95_s": pct(all_lats, 95),
            "stride_lat_max_s": pct(all_lats, 100),
            "bg_requests": len(bg_lats),
            "bg_lat_p50_s": pct([x for x in bg_lats if x == x], 50),
            "bg_lat_p95_s": pct([x for x in bg_lats if x == x], 95),
        }
        results["runs"][f"n{n}"] = run
        print(json.dumps(run), flush=True)
        bg_lats.clear()

    httpd.shutdown()
    server.shutdown()
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
