#!/usr/bin/env python
"""Quickstart walkthrough (the reference's colab_example.ipynb analogue).

Runs entirely offline: builds a randomly-initialized tiny model, makes a
synthetic WAV, and exercises the full API surface — transcribe, timestamps,
longform, save/load, fine-tune a few steps, evaluate.  Swap
``load_model(..., init="random")`` for a converted checkpoint artifact to
run the real v3 models (see tools/convert_checkpoint.py).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import gigaam_tpu
from gigaam_tpu.audio import save_wav
from gigaam_tpu.data import write_manifest


def make_audio(tmp="quickstart_data"):
    os.makedirs(tmp, exist_ok=True)
    rng = np.random.default_rng(0)
    sr = gigaam_tpu.SAMPLE_RATE
    t = np.arange(sr * 3) / sr
    short = (0.3 * np.sin(2 * np.pi * 440 * t)
             + 0.03 * rng.standard_normal(len(t))).astype(np.float32)
    save_wav(f"{tmp}/short.wav", short)
    pieces = []
    for i in range(4):
        tt = np.arange(sr * 8) / sr
        pieces += [
            (0.3 * np.sin(2 * np.pi * (300 + 40 * i) * tt)).astype(np.float32),
            np.zeros(sr, dtype=np.float32),
        ]
    save_wav(f"{tmp}/long.wav", np.concatenate(pieces))
    rows = [(os.path.abspath(f"{tmp}/short.wav"), 3.0, "привет мир")]
    write_manifest(f"{tmp}/manifest.tsv", rows)
    return tmp


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="use the full-size v3 config (needs an accelerator)")
    args = ap.parse_args()

    tmp = make_audio()

    print("== load (random init; use a converted artifact for real output)")
    if args.full:
        model = gigaam_tpu.load_model("v3_ctc", init="random")
    else:
        # scaled-down v3-shaped config so the walkthrough runs on CPU too
        cfg = gigaam_tpu.make_preset("v3_ctc")
        cfg.encoder.n_layers = 2
        cfg.encoder.d_model = 64
        cfg.encoder.n_heads = 4
        cfg.encoder.ff_expansion_factor = 2
        cfg.encoder.conv_kernel_size = 7
        cfg.head.feat_in = 64
        from gigaam_tpu.models.model import model_class_for

        model = model_class_for(cfg)(cfg, seed=0)

    print("== shortform transcribe + word timestamps")
    res = model.transcribe(f"{tmp}/short.wav", word_timestamps=True)
    print("  text:", repr(res.text))
    for w in (res.words or [])[:3]:
        conf = f"  conf {w.confidence:.2f}" if w.confidence is not None else ""
        print(f"  word {w.text!r}  [{w.start:.2f}, {w.end:.2f}]{conf}")

    if model.cfg.head is not None and hasattr(model.cfg.head, "decoder"):
        print("== RNNT beam search")
        print("  beam-4:", repr(model.transcribe(
            f"{tmp}/short.wav", beam_size=4).text))
    elif res.text.strip():
        print("== forced alignment of a known transcript (CTC)")
        ali = model.align(f"{tmp}/short.wav", res.text)
        for w in (ali.words or [])[:3]:
            print(f"  word {w.text!r}  [{w.start:.2f}, {w.end:.2f}]"
                  f"  conf {w.confidence:.2f}")

    print("== longform (VAD segmentation + batched decode)")
    long_res = model.transcribe_longform(f"{tmp}/long.wav")
    for seg in long_res:
        print(f"  [{seg.start:5.1f}-{seg.end:5.1f}] {seg.text[:40]!r}")

    print("== save / load native artifact")
    gigaam_tpu.save_model(model, f"{tmp}/model")
    model2 = gigaam_tpu.load_model(f"{tmp}/model")
    assert model2.transcribe(f"{tmp}/short.wav").text == res.text
    print("  roundtrip OK")

    print("== a few fine-tuning steps (see train CLI for the real loop)")
    from gigaam_tpu.train.train import main as train_main

    train_main([
        "--model_name", f"{tmp}/model",
        "--train_manifest", f"{tmp}/manifest.tsv",
        "--val_manifest", f"{tmp}/manifest.tsv",
        "--batch_size", "1", "--max_steps", "2", "--precision", "fp32",
        "--save_dir", f"{tmp}/exp", "--log_every_n_steps", "1",
    ])
    print("done — artifacts in", tmp)


if __name__ == "__main__":
    main()
