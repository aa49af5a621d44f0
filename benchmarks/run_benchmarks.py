#!/usr/bin/env python
"""Benchmark harness: the framework's analogue of the reference's
evaluation.md / triton_scripts timing tables, measured on the local
accelerator with device-side loops (see ``gigaam_tpu/profiling.py``).

Covers:
  * attention microbenchmark, XLA vs Pallas fused (evaluation.md:53-59)
  * full encoder forward at several (batch, seconds) points (":61-67")
  * end-to-end RTF for v3_ctc and v3_rnnt (triton_scripts/README.md:71-83)

Usage:  python benchmarks/run_benchmarks.py [--quick] [--json out.json]
        [--trace /tmp/xprof]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--json", default=None)
    ap.add_argument("--trace", default=None,
                    help="capture an xprof trace of one e2e batch")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gigaam_tpu import load_model
    from gigaam_tpu.models.model import pad_wav_batch
    from gigaam_tpu.ops.attention import _masked_softmax
    from gigaam_tpu.ops.pallas_attention import (
        fused_attention_available,
        fused_mha,
    )
    from gigaam_tpu.profiling import device_timeit, trace

    results = {}
    rng = np.random.default_rng(0)

    # ---- attention micro ------------------------------------------------
    def xla_att(q, k, v, valid):
        d = q.shape[-1]
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) / np.sqrt(d)
        a = _masked_softmax(s, valid).astype(v.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", a, v,
                          preferred_element_type=jnp.float32).astype(q.dtype)

    att_points = [(1, 10), (8, 20)] if args.quick else [(1, 10), (8, 20),
                                                        (32, 30)]
    for b, sec in att_points:
        t = sec * 100 // 4  # approx frames after 4x subsampling
        shape = (b, 16, t, 48)
        mk = lambda: jnp.asarray(
            rng.standard_normal(shape).astype(np.float32)).astype(jnp.bfloat16)
        q, k, v = mk(), mk(), mk()
        valid = jnp.ones((b, t), bool)
        # chain=True: attention output has q's shape, so each iteration
        # feeds the previous output back as q — defeats the remote plugin's
        # result-reuse fast path
        # k=50 amortizes the tunnel's ~30 ms dispatch latency for small ops
        dt_x = device_timeit(xla_att, (q, k, v, valid), chain=True, k=50)
        row = {"xla_ms": round(dt_x * 1e3, 3)}
        if fused_attention_available(t):
            dt_p = device_timeit(lambda q, k, v, m: fused_mha(q, k, v, m),
                                 (q, k, v, valid), chain=True, k=50)
            row["pallas_ms"] = round(dt_p * 1e3, 3)
        results[f"attention_b{b}_{sec}s"] = row
        print(f"attention b{b} {sec}s: {row}")

    # ---- encoder + e2e --------------------------------------------------
    model = load_model("v3_ctc", init="random")
    enc_points = [(1, 10), (8, 20)] if args.quick else [(1, 10), (8, 20),
                                                        (8, 30)]
    for b, sec in enc_points:
        wavs = [(0.1 * rng.standard_normal(16000 * sec)).astype(np.float32)
                for _ in range(b)]
        batch, lens = pad_wav_batch(wavs)
        batch, lens = jnp.asarray(batch), jnp.asarray(lens)
        pos = model._pos_for(batch.shape[1])
        # time the labels output (index 0): it depends on the waveforms, so
        # the encoder cannot be dead-code-eliminated (enc_lens alone would
        # be — it is a pure function of the lengths)
        dt = device_timeit(
            lambda w, l: model._ctc_forward_impl(model.params, w, l, pos)[0],
            (batch, lens))
        rtf = b * sec / dt
        results[f"v3_ctc_e2e_b{b}_{sec}s"] = {
            "ms": round(dt * 1e3, 2), "rtf": round(rtf, 0)}
        print(f"v3_ctc e2e b{b} {sec}s: {dt * 1e3:.2f} ms  RTF {rtf:.0f}")

    if args.trace:
        wavs = [(0.1 * rng.standard_normal(16000 * 10)).astype(np.float32)
                for _ in range(8)]
        batch, lens = pad_wav_batch(wavs)
        batch, lens = jnp.asarray(batch), jnp.asarray(lens)
        pos = model._pos_for(batch.shape[1])
        jax.block_until_ready(
            model._asr_fwd(model.params, batch, lens, pos))
        with trace(args.trace):
            jax.block_until_ready(
                model._asr_fwd(model.params, batch, lens, pos))
        print(f"xprof trace written to {args.trace}")

    # ---- RNNT e2e (encoder + on-device label loop) ----------------------
    if not args.quick:
        import time

        rnnt = load_model("v3_rnnt", init="random")
        b, sec = 8, 20
        wavs = [(0.1 * rng.standard_normal(16000 * sec)).astype(np.float32)
                for _ in range(b)]
        # while_loop prevents fori-loop nesting; time dispatches directly
        outs = rnnt._decode_batch(wavs, word_timestamps=False)  # compile
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            rnnt._decode_batch(wavs, word_timestamps=False)
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        results[f"v3_rnnt_e2e_b{b}_{sec}s"] = {
            "ms": round(dt * 1e3, 2), "rtf": round(b * sec / dt, 0)}
        print(f"v3_rnnt e2e b{b} {sec}s: {dt * 1e3:.2f} ms  "
              f"RTF {b * sec / dt:.0f}")

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
