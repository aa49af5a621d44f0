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
    ap.add_argument("--train", action="store_true",
                    help="also time fine-tune steps (CTC bf16, bs8 x 20 s)")
    ap.add_argument("--only", default=None,
                    choices=["attention", "ctc", "rnnt", "relpos", "emo",
                             "encoder128", "train", "pretrain"],
                    help="run a single section")
    args = ap.parse_args()

    def want(section: str) -> bool:
        return args.only is None or args.only == section

    # --only <section> implies the user wants it, overriding other gates
    run_rnnt = (not args.quick or args.only == "rnnt") and want("rnnt")
    run_train = (args.train or args.only == "train") and want("train")

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

    att_points = ([(1, 10), (8, 20)] if args.quick else [(1, 10), (8, 20),
                                                          (32, 30)])
    if not want("attention"):
        att_points = []
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
    model = load_model("v3_ctc", init="random") if want("ctc") else None
    enc_points = ([(1, 10), (8, 20)] if args.quick else [(1, 10), (8, 20),
                                                         (8, 30), (32, 20)])
    if not want("ctc"):
        enc_points = []
    for b, sec in enc_points:
        wavs = [(0.1 * rng.standard_normal(16000 * sec)).astype(np.float32)
                for _ in range(b)]
        batch, lens = pad_wav_batch(wavs)
        batch, lens = jnp.asarray(batch), jnp.asarray(lens)
        pos = model._pos_for(batch.shape[1])
        # time the labels output (index 0): it depends on the waveforms, so
        # the encoder cannot be dead-code-eliminated (enc_lens alone would
        # be — it is a pure function of the lengths).  params are passed as
        # a jit argument, NOT closed over: closure constants get serialized
        # into the remote-compile request and 220M fp32 params overflow the
        # axon tunnel's body limit (HTTP 413).
        dt = device_timeit(
            lambda w, p: model._ctc_forward_impl(p, w, lens, pos)[0],
            (batch, model.params))
        rtf = b * sec / dt
        results[f"v3_ctc_e2e_b{b}_{sec}s"] = {
            "ms": round(dt * 1e3, 2), "rtf": round(rtf, 0)}
        print(f"v3_ctc e2e b{b} {sec}s: {dt * 1e3:.2f} ms  RTF {rtf:.0f}")

    if args.trace and model is not None:
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

    # ---- v2 (rel-pos attention) e2e: exercises the fused rel-pos kernel
    # with the in-VMEM shear (ops/pallas_attention.py) --------------------
    if (not args.quick or args.only == "relpos") and want("relpos"):
        m2 = load_model("v2_ctc", init="random")
        for b, sec in [(8, 20)]:
            wavs = [(0.1 * rng.standard_normal(16000 * sec))
                    .astype(np.float32) for _ in range(b)]
            batch, lens = pad_wav_batch(wavs)
            batch, lens = jnp.asarray(batch), jnp.asarray(lens)
            pos = m2._pos_for(batch.shape[1])
            dt = device_timeit(
                lambda w, p: m2._ctc_forward_impl(p, w, lens, pos)[0],
                (batch, m2.params))
            rtf = b * sec / dt
            results[f"v2_ctc_e2e_b{b}_{sec}s"] = {
                "ms": round(dt * 1e3, 2), "rtf": round(rtf, 0)}
            print(f"v2_ctc e2e b{b} {sec}s: {dt * 1e3:.2f} ms  RTF {rtf:.0f}")
        del m2
        import gc; gc.collect()

    # ---- RNNT e2e (encoder + on-device label loop) ----------------------
    if run_rnnt:
        from gigaam_tpu.decode.rnnt_greedy import rnnt_greedy_decode

        rnnt = load_model("v3_rnnt", init="random")
        # A random-weight joint spams non-blank tokens, driving the label
        # loop to its max_symbols_per_step ceiling (~10x the realistic trip
        # count: trained models emit a few tokens/second, so iterations
        # ~= T + U ~= T).  Bias the output toward blank so the loop runs
        # exactly T iterations — the trip count a trained checkpoint
        # exhibits — and time encoder and decode loop separately with
        # device-side amortization (the tunnel costs ~25 ms per dispatch).
        head = jax.tree.map(lambda x: x, rnnt.params["head"])
        b_out = head["joint"]["out"]["b"]
        head["joint"]["out"]["b"] = b_out.at[b_out.shape[0] - 1].add(1e4)

        # b32 shows the serving sweet spot: the decode loop is
        # latency-bound, so its cost is nearly flat in batch while encoder
        # time scales linearly — RTF approaches the CTC model's.
        for b, sec in [(8, 20), (32, 20)]:
            wavs = [(0.1 * rng.standard_normal(16000 * sec))
                    .astype(np.float32) for _ in range(b)]
            enc, enc_len = rnnt.encode_batch(wavs)
            enc = enc.astype(jnp.float32)
            t_frames = int(np.asarray(enc_len).max())
            dt_dec = device_timeit(
                lambda e, h: rnnt_greedy_decode(h, e, enc_len)[0],
                (enc, head), k=10)

            batch, lens = pad_wav_batch(wavs)
            batch, lens = jnp.asarray(batch), jnp.asarray(lens)
            pos = rnnt._pos_for(batch.shape[1])
            dt_enc = device_timeit(
                lambda w, p: rnnt._encode_impl(p, w, lens, pos)[0],
                (batch, rnnt.params))

            dt = dt_enc + dt_dec
            results[f"v3_rnnt_e2e_b{b}_{sec}s"] = {
                "encoder_ms": round(dt_enc * 1e3, 2),
                "decode_ms": round(dt_dec * 1e3, 2),
                "decode_us_per_frame": round(dt_dec / t_frames * 1e6, 1),
                "ms": round(dt * 1e3, 2), "rtf": round(b * sec / dt, 0)}
            print(f"v3_rnnt e2e b{b} {sec}s: enc {dt_enc * 1e3:.2f} + dec "
                  f"{dt_dec * 1e3:.2f} ms  RTF {b * sec / dt:.0f}")
        del rnnt, head
        import gc; gc.collect()

    # ---- emo classification (encoder + masked mean-pool + linear head) --
    if (not args.quick or args.only == "emo") and want("emo"):
        emo = load_model("emo", init="random")
        b, sec = 8, 10
        wavs = [(0.1 * rng.standard_normal(16000 * sec)).astype(np.float32)
                for _ in range(b)]
        batch, lens = pad_wav_batch(wavs)
        batch, lens = jnp.asarray(batch), jnp.asarray(lens)
        pos = emo._pos_for(batch.shape[1])
        dt = device_timeit(
            lambda w, p: emo._probs_impl(p, w, lens, pos),
            (batch, emo.params))
        rtf = b * sec / dt
        results[f"emo_probs_b{b}_{sec}s"] = {
            "ms": round(dt * 1e3, 2), "rtf": round(rtf, 0)}
        print(f"emo probs b{b} {sec}s: {dt * 1e3:.2f} ms  RTF {rtf:.0f}")
        del emo
        import gc; gc.collect()

    # ---- encoder-only forward at the reference table's largest point
    # (bs128 x 30 s; evaluation.md:61-67 reports 294-324 ms on CUDA) ------
    if args.only == "encoder128" or (want("encoder128") and not args.quick
                                     and args.train):
        m = model or load_model("v3_ctc", init="random")
        b, sec = 128, 30
        wavs = [(0.1 * rng.standard_normal(16000 * sec)).astype(np.float32)
                for _ in range(b)]
        batch, lens = pad_wav_batch(wavs)
        batch, lens = jnp.asarray(batch), jnp.asarray(lens)
        pos = m._pos_for(batch.shape[1])
        dt = device_timeit(
            lambda w, p: m._encode_impl(p, w, lens, pos)[0],
            (batch, m.params), k=5)
        results[f"v3_encoder_b{b}_{sec}s"] = {
            "ms": round(dt * 1e3, 2), "rtf": round(b * sec / dt, 0)}
        print(f"v3 encoder b{b} {sec}s: {dt * 1e3:.2f} ms  "
              f"RTF {b * sec / dt:.0f} (reference CUDA: 294-324 ms)")

    # ---- fine-tune step (reference anchor: ~4 min/epoch, bs64 bf16,
    # 2 GPUs ~ example.ipynb; here: audio-seconds trained /s/chip) ---------
    if run_train:
        import time

        from gigaam_tpu.train.finetune import FineTuner, TrainConfig

        def time_train(kind: str, b: int, sec: int,
                       remat_policy: str = "full", tag: str = "") -> None:
            name = kind if kind.startswith("v") else f"v3_{kind}"
            model_t = load_model(name, init="random")
            # remat keeps bs8 x 20 s within a single 16 GB chip (the
            # reference needs activation checkpointing for 24 GB GPUs too)
            tc = TrainConfig(lr=1e-5, total_steps=100, precision="bf16",
                             spec_augment=False,
                             activation_checkpointing=True,
                             remat_policy=remat_policy)
            ft = FineTuner(model_t, tc)
            u = 32
            wavs = np.stack([(0.1 * rng.standard_normal(16000 * sec))
                             .astype(np.float32) for _ in range(b)])
            lens = np.full((b,), 16000 * sec, np.int32)
            toks = rng.integers(0, 30, (b, u)).astype(np.int32)
            tlens = np.full((b,), u, np.int32)
            batch = tuple(jnp.asarray(x) for x in (wavs, lens, toks, tlens))
            rng_key = jax.random.PRNGKey(0)

            k = 3 if args.quick else 4

            @jax.jit
            def run_k(params, opt_state, w):
                def body(i, carry):
                    p, o, _ = carry
                    bi = (w + (1e-7 * i).astype(w.dtype),) + batch[1:]
                    p, o, loss, _ = ft._train_step_impl(p, o, bi, rng_key)
                    return p, o, loss
                return jax.lax.fori_loop(
                    0, k, body, (params, opt_state, jnp.float32(0)))

            p, o, loss = run_k(ft.params, ft.opt_state, batch[0])  # compile
            jax.block_until_ready(loss)
            ts = []
            for v in (p, ft.params, p):  # alternate buffers vs reuse path
                t0 = time.perf_counter()
                _, _, loss = run_k(v, o, batch[0])
                float(loss)
                ts.append(time.perf_counter() - t0)
            dt = min(ts) / k
            # train MFU/HFU accounting (round-4 verdict #4): MFU counts the
            # conventional 3x-forward model FLOPs; HFU adds the remat
            # recompute the chip actually executes
            from bench import PEAK_TFLOPS, train_step_flops

            fl = train_step_flops(
                b, 16000 * sec, remat=remat_policy,
                rel_pos=kind.startswith("v2") or kind.startswith("v1"),
                head="rnnt" if "rnnt" in kind else "ctc", u_len=u)
            results[f"train_{kind}{tag}_step_b{b}_{sec}s"] = {
                "ms": round(dt * 1e3, 1),
                "audio_s_per_s": round(b * sec / dt, 0),
                "mfu": round(fl["model"] / dt / (PEAK_TFLOPS * 1e12), 4),
                "hfu": round(fl["hardware"] / dt / (PEAK_TFLOPS * 1e12), 4)}
            print(f"train {kind}{tag} step b{b} {sec}s: {dt * 1e3:.1f} ms  "
                  f"({b * sec / dt:.0f} audio-s trained/s/chip, "
                  f"MFU {fl['model'] / dt / (PEAK_TFLOPS * 1e12):.3f} "
                  f"HFU {fl['hardware'] / dt / (PEAK_TFLOPS * 1e12):.3f})")

        time_train("ctc", 8, 20)
        if not args.quick:
            # 'dots' remat (save matmul outputs in backward): trades HBM
            # for recompute; OOM at this batch is a valid finding
            try:
                time_train("ctc", 8, 20, remat_policy="dots", tag="_dots")
            except Exception as exc:
                results["train_ctc_dots_step_b8_20s"] = {
                    "error": f"{type(exc).__name__}: {exc}"[:200]}
                print(f"train ctc dots: failed ({type(exc).__name__})")
            try:
                # b16 + dots: the best measured train throughput config
                # (round 3); kept in the standard sweep so refreshes track it
                time_train("ctc", 16, 20, remat_policy="dots", tag="_dots")
            except Exception as exc:
                results["train_ctc_dots_step_b16_20s"] = {
                    "error": f"{type(exc).__name__}: {exc}"[:200]}
                print(f"train ctc dots b16: failed ({type(exc).__name__})")
            time_train("rnnt", 8, 20)
            # rel-pos generation: exercises the fused rel-pos kernel's
            # Pallas backward (shear/unshear in VMEM)
            time_train("v2_ctc", 8, 20)

    # ---- BEST-RQ SSL pretrain step (no reference anchor: the reference
    # has no pretraining code; metric is audio-seconds pretrained /s/chip)
    if (args.train or args.only == "pretrain") and want("pretrain"):
        import time

        from gigaam_tpu.train.pretrain import PretrainConfig, SSLPretrainer

        model_p = load_model("v3_ssl", init="random")
        pc = PretrainConfig(lr=1e-4, total_steps=100, precision="bf16",
                            activation_checkpointing=True)
        pt = SSLPretrainer(model_p, pc)
        b, sec = 8, 20
        wavs = np.stack([(0.1 * rng.standard_normal(16000 * sec))
                         .astype(np.float32) for _ in range(b)])
        lens = np.full((b,), 16000 * sec, np.int32)
        batch = (jnp.asarray(wavs), jnp.asarray(lens))
        rng_key = jax.random.PRNGKey(0)
        k = 3 if args.quick else 4

        @jax.jit
        def run_kp(params, opt_state, w):
            def body(i, carry):
                p, o, _ = carry
                bi = (w + (1e-7 * i).astype(w.dtype), batch[1])
                p, o, loss, _ = pt._train_step_impl(p, o, bi, rng_key)
                return p, o, loss
            return jax.lax.fori_loop(
                0, k, body, (params, opt_state, jnp.float32(0)))

        p2, o2, loss = run_kp(pt.params, pt.opt_state, batch[0])  # compile
        jax.block_until_ready(loss)
        ts = []
        for v in (p2, pt.params, p2):
            t0 = time.perf_counter()
            _, _, loss = run_kp(v, o2, batch[0])
            float(loss)
            ts.append(time.perf_counter() - t0)
        dt = min(ts) / k
        from bench import PEAK_TFLOPS, train_step_flops

        fl = train_step_flops(b, 16000 * sec, remat="full", head="bestrq",
                              codebook=pc.codebook_size)
        results[f"pretrain_bestrq_step_b{b}_{sec}s"] = {
            "ms": round(dt * 1e3, 1),
            "audio_s_per_s": round(b * sec / dt, 0),
            "mfu": round(fl["model"] / dt / (PEAK_TFLOPS * 1e12), 4),
            "hfu": round(fl["hardware"] / dt / (PEAK_TFLOPS * 1e12), 4)}
        print(f"pretrain BEST-RQ step b{b} {sec}s: {dt * 1e3:.1f} ms  "
              f"({b * sec / dt:.0f} audio-s pretrained/s/chip, "
              f"MFU {fl['model'] / dt / (PEAK_TFLOPS * 1e12):.3f})")

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
