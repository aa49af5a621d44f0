#!/usr/bin/env python
"""Serving walkthrough: dynamic-batching HTTP server + client.

Runs offline with a randomly-initialized tiny model; swap
``init="random"`` for a converted checkpoint to serve the real models
(``python -m gigaam_tpu.serve --model_name v3_ctc`` does the same from
the CLI).
"""

import os
import sys
import threading

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from http.server import ThreadingHTTPServer

import numpy as np

import gigaam_tpu
from gigaam_tpu.audio import save_wav
from gigaam_tpu.client import health, transcribe_files
from gigaam_tpu.serve import BatchingASRServer, make_handler


def main() -> None:
    os.makedirs("serving_data", exist_ok=True)
    sr = gigaam_tpu.SAMPLE_RATE
    rng = np.random.default_rng(0)

    # one short clip, one longform clip (routed automatically by the client)
    t = np.arange(sr * 2) / sr
    save_wav("serving_data/short.wav",
             (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32))
    burst = (0.3 * np.sin(2 * np.pi * 300 * np.arange(sr * 9) / sr)
             + 0.02 * rng.standard_normal(sr * 9)).astype(np.float32)
    save_wav("serving_data/long.wav",
             np.concatenate([burst, np.zeros(sr, np.float32)] * 3))

    model = gigaam_tpu.load_model("ctc", init="random")
    server = BatchingASRServer(model, max_batch=8, beam_size=1)
    server.warmup([5])
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(server))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_port}"
    print("server:", health(url))

    results = transcribe_files(
        url, ["serving_data/short.wav", "serving_data/long.wav"],
        timestamps=True)
    print("short:", results[0])
    print("long segments:", len(results[1]["segments"]))

    httpd.shutdown()
    server.shutdown()
    print("done")


if __name__ == "__main__":
    main()
