#!/usr/bin/env python
"""Weak-scaling harness for the mesh-sharded paths.

The north-star multi-chip metric is >=90% linear scaling of audio-s/s
(BASELINE.md).  Real multi-chip hardware is not present in this image, so
this harness runs the SAME pjit-sharded code on an N-device *virtual CPU
mesh* (``--xla_force_host_platform_device_count``) and reports weak-scaling
efficiency: per-device batch held constant while devices grow, so perfect
scaling = flat step time.  CPU timings are indicative only (no ICI), but
the sharding/collective structure exercised is exactly what runs on a TPU
pod — on real hardware the identical script measures true scaling.

Usage:  python benchmarks/scaling.py [--devices 1,2,4,8] [--tp 1]
        [--mode train|infer|both] [--json out.json]

Must be launched fresh (sets XLA_FLAGS before importing jax).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8",
                    help="comma-separated device counts (virtual CPU mesh)")
    ap.add_argument("--tp", type=int, default=1,
                    help="model-axis (tensor-parallel) size; data = n // tp")
    ap.add_argument("--per-device-batch", type=int, default=2)
    ap.add_argument("--seconds", type=int, default=2,
                    help="audio seconds per sample (tiny: CPU mesh)")
    ap.add_argument("--mode", default="both",
                    choices=["train", "infer", "both"])
    ap.add_argument("--json", default=None)
    return ap.parse_args()


def main() -> None:
    args = parse_args()
    counts = [int(c) for c in args.devices.split(",")]
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={max(counts)}")
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from gigaam_tpu.config import (
        CTCHeadConfig, DecodingConfig, EncoderConfig, FeaturesConfig,
        ModelConfig, RU_VOCAB)
    from gigaam_tpu.models.model import GigaAMASR, pad_wav_batch
    from gigaam_tpu.parallel.mesh import make_mesh
    from gigaam_tpu.train.finetune import FineTuner, TrainConfig

    # small-but-real config: TP-shardable head dims, few layers
    v = len(RU_VOCAB) + 1
    cfg = ModelConfig(
        model_name="scaling", model_class="asr",
        preprocessor=FeaturesConfig(),
        encoder=EncoderConfig(n_layers=2, d_model=256, n_heads=8,
                              ff_expansion_factor=4),
        head=CTCHeadConfig(feat_in=256, num_classes=v),
        decoding=DecodingConfig(kind="ctc_greedy", vocabulary=list(RU_VOCAB)))

    sr = 16000
    rng = np.random.default_rng(0)

    def batch_for(n_dev: int):
        b = args.per_device_batch * n_dev
        wavs = [(0.1 * rng.standard_normal(sr * args.seconds)
                 ).astype(np.float32) for _ in range(b)]
        batch, lens = pad_wav_batch(wavs)
        toks = np.full((b, 8), 3, np.int32)
        tlens = np.full((b,), 8, np.int32)
        return batch, lens, toks, tlens

    def timeit(fn, reps=5):
        fn()  # compile
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    results = {"mode": args.mode, "tp": args.tp,
               "per_device_batch": args.per_device_batch, "points": []}

    for n in counts:
        if n % args.tp:
            print(f"skip n={n}: not divisible by tp={args.tp}")
            continue
        devices = jax.devices()[:n]
        mesh = make_mesh(data=n // args.tp, model=args.tp, devices=devices)
        point = {"devices": n}

        if args.mode in ("train", "both"):
            model = GigaAMASR(cfg, seed=0)
            ft = FineTuner(model, TrainConfig(lr=1e-4), mesh=mesh)
            batch, lens, toks, tlens = batch_for(n // args.tp)
            db = (batch, lens, toks, tlens)
            key = jax.random.PRNGKey(0)

            def step():
                # metrics are device scalars (train_step never syncs);
                # block explicitly so the timing covers the device work
                m = ft.train_step(db, key)
                jax.block_until_ready((m["loss"], m["grad_norm"]))

            t = timeit(step)
            point["train_step_s"] = t
            point["train_audio_s_per_s"] = (
                args.per_device_batch * (n // args.tp) * args.seconds / t)

        if args.mode in ("infer", "both"):
            model = GigaAMASR(cfg, seed=0)
            model.set_mesh(mesh)
            batch, lens, _, _ = batch_for(n // args.tp)
            wav_list = [w[:l] for w, l in zip(np.asarray(batch), lens)]

            def infer():
                enc, el = model.encode_batch(wav_list)
                jax.block_until_ready(enc)

            t = timeit(infer)
            point["infer_s"] = t
            point["infer_audio_s_per_s"] = (
                args.per_device_batch * (n // args.tp) * args.seconds / t)

        results["points"].append(point)
        print(point, flush=True)

    # weak-scaling efficiency vs the smallest point (flat step time = 1.0)
    if not results["points"]:
        raise SystemExit(
            f"no device count in {args.devices!r} is divisible by "
            f"--tp {args.tp}; nothing to measure")
    base = results["points"][0]
    eff_key = {"train_step_s": "train_weak_eff", "infer_s": "infer_weak_eff"}
    for p in results["points"]:
        for k, ek in eff_key.items():
            if k in p and k in base:
                p[ek] = round(base[k] / p[k], 3)
    if jax.default_backend() == "cpu":
        results["caveat"] = (
            "virtual CPU mesh: all devices share one host's cores, so total "
            "FLOPs grow with N on fixed silicon — expect eff ~ 1/N here; "
            "the number is meaningful only on real multi-chip hardware")
        print("NOTE:", results["caveat"])
    print(json.dumps(results, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
