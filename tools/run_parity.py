#!/usr/bin/env python
"""One-command connected-evidence bundle (needs network + disk for ckpts).

Produces EVERYTHING on the round-verdict "missing evidence" list in one run
and writes a single machine-readable ``PARITY_RESULTS.json``:

  1. reference checkpoints -> converted native artifacts (md5-pinned),
  2. golden transcript/timestamp/emo/longform suite (``tests/test_golden.py``)
     with the AST crosscheck against the reference's own test sources,
  3. real-sentencepiece tokenizer parity (``tests/test_sp_parity.py``;
     skipped cleanly when the library is absent),
  4. pyannote VAD conversion + real-weights parity (when ``--vad`` and
     ``pyannote.audio`` are available: frame speech-probs compared directly),
  5. streaming-vs-offline WER on trained weights (meaningless on random
     weights — see benchmarks/RESULTS_streaming.json),
  6. optional WER table vs the reference's published averages
     (``--manifest``).

Usage:
  python tools/run_parity.py                         # partial: 4 flagship models
  python tools/run_parity.py --models all            # every registry entry
  python tools/run_parity.py --models v3_ctc,v3_rnnt
  python tools/run_parity.py --vad /path/to/pyannote/pytorch_model.bin
  python tools/run_parity.py --manifest test.tsv     # + WER table

Exit code 0 = everything available ran and matched; nonzero = a download,
conversion, parity assertion, or WER regression failed.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# partial set mirrors the reference's CI subset (tests/test_loading.py:82-86)
PARTIAL = ["emo", "v2_ssl", "v3_ctc", "v3_e2e_rnnt"]
ALL = ["emo", "v1_ctc", "v1_rnnt", "v1_ssl", "v2_ctc", "v2_rnnt", "v2_ssl",
       "v3_ctc", "v3_rnnt", "v3_e2e_ctc", "v3_e2e_rnnt", "v3_ssl"]

# reference WER averages over its 10 Russian test sets (evaluation.md:18)
REF_WER = {"v3_ctc": 9.1, "v3_rnnt": 8.3, "v3_e2e_ctc": 12.0,
           "v3_e2e_rnnt": 11.2, "v2_ctc": 11.1, "v2_rnnt": 10.6,
           "v1_ctc": 14.2, "v1_rnnt": 13.8}


def _pytest(path: str, env: dict, *extra: str) -> int:
    return subprocess.call(
        [sys.executable, "-m", "pytest", os.path.join(REPO, "tests", path),
         "-v", "-rs", *extra], env=env, cwd=REPO)


def main() -> int:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--models", default=",".join(PARTIAL),
                    help="comma list or 'all' (default: the reference's "
                         "partial CI set)")
    ap.add_argument("--root", default=os.path.expanduser("~/.cache/gigaam_tpu"),
                    help="download/convert cache (= GIGAAM_GOLDEN_ROOT)")
    ap.add_argument("--vad", default=None,
                    help="pyannote segmentation checkpoint to convert "
                         "(enables the longform golden tests + VAD parity)")
    ap.add_argument("--manifest", default=None,
                    help="TSV manifest (path\\tduration\\ttext) for WER eval")
    ap.add_argument("--wer_tolerance", type=float, default=0.5,
                    help="allowed WER regression (abs %%-points) vs the "
                         "reference's published averages")
    ap.add_argument("--skip_tests", action="store_true",
                    help="only download/convert, don't run pytest")
    ap.add_argument("--skip_streaming", action="store_true",
                    help="skip the streaming-vs-offline WER measurement")
    ap.add_argument("--out", default=os.path.join(REPO, "PARITY_RESULTS.json"),
                    help="where to write the machine-readable results bundle")
    args = ap.parse_args()

    models = ALL if args.models == "all" else args.models.split(",")
    os.makedirs(args.root, exist_ok=True)
    failures = []
    results: dict = {"models": {}, "sections": {}}

    def section(name: str, status: str, **extra) -> None:
        results["sections"][name] = {"status": status, **extra}
        print(f"[{name}] {status}" + (f" {extra}" if extra else ""))

    import gigaam_tpu

    # 1. audio
    for name in ("example.wav", "long_example.wav"):
        try:
            gigaam_tpu._download_file(f"{gigaam_tpu._URL_DIR}/{name}",
                                      os.path.join(args.root, name))
            print(f"[audio] {name}: ok")
        except Exception as e:
            failures.append(f"audio {name}: {e}")
            print(f"[audio] {name}: FAILED ({e})")

    # 2. checkpoints -> converted native artifacts (idempotent)
    for name in models:
        try:
            gigaam_tpu.load_model(name, download_root=args.root)
            results["models"][name] = "converted"
            print(f"[model] {name}: converted + loadable")
        except Exception as e:
            failures.append(f"model {name}: {e}")
            results["models"][name] = f"FAILED: {e}"
            print(f"[model] {name}: FAILED ({e})")

    # 3. optional neural VAD conversion to the auto-discovery location,
    # plus real-weights parity when pyannote.audio itself is importable
    if args.vad:
        cfg = params = None
        try:
            from gigaam_tpu.checkpoint import convert_pyannote_vad
            from gigaam_tpu.models.vad_net import save_vad

            cfg, params = convert_pyannote_vad(args.vad)
            save_vad(os.path.join(args.root, "vad_segmentation"), cfg, params)
            section("vad_convert", "ok")
        except Exception as e:
            failures.append(f"vad: {e}")
            section("vad_convert", f"FAILED: {e}")
        if params is None:
            # conversion already failed and was recorded; one root cause
            # must not double-count as a second "parity" failure
            section("vad_parity", "skipped (conversion failed)")
        else:
            try:
                delta = _vad_realweights_parity(args.vad, cfg, params)
                if delta > 1e-2:
                    failures.append(f"vad parity: max|dP|={delta:.4f} > 1e-2")
                    section("vad_parity", "FAILED", max_abs_dprob=delta)
                else:
                    section("vad_parity", "ok", max_abs_dprob=delta)
            except ImportError:
                section("vad_parity", "skipped (pyannote.audio not installed)")
            except Exception as e:
                failures.append(f"vad parity: {e}")
                section("vad_parity", f"FAILED: {e}")

    # 4. golden suite — the crosscheck first: it parses the reference's own
    # test sources and fails loudly if our golden constants drifted from
    # them, so a transcription typo can never masquerade as model disparity
    if not args.skip_tests:
        env = dict(os.environ,
                   GIGAAM_GOLDEN_ROOT=args.root, GIGAAM_GOLDEN="1")
        rc = _pytest("test_golden_crosscheck.py", env)
        if rc != 0:
            failures.append(f"golden crosscheck rc={rc} — expectations "
                            f"drifted from the reference test sources")
        section("golden_crosscheck", "ok" if rc == 0 else f"FAILED rc={rc}")
        rc = _pytest("test_golden.py", env, "-m", "golden")
        if rc != 0:
            failures.append(f"golden pytest rc={rc}")
        section("golden", "ok" if rc == 0 else f"FAILED rc={rc}")

        # real-sentencepiece tokenizer parity (self-skips without the lib;
        # rc 0 covers both pass and clean skip, pytest returns 5 for
        # no-tests-collected only when the whole file is deselected)
        try:
            import sentencepiece  # noqa: F401
            rc = _pytest("test_sp_parity.py", env)
            if rc != 0:
                failures.append(f"sentencepiece parity rc={rc}")
            section("sentencepiece_parity",
                    "ok" if rc == 0 else f"FAILED rc={rc}")
        except ImportError:
            section("sentencepiece_parity",
                    "skipped (sentencepiece not installed)")

    # 5. streaming-vs-offline WER on trained weights (the offline proxy in
    # benchmarks/RESULTS_streaming.json is honest that random weights make
    # this row meaningless; here the real v3_ctc weights are available)
    if not args.skip_streaming and not args.skip_tests and \
            "v3_ctc" in models and \
            not str(results["models"].get("v3_ctc", "")).startswith("FAILED"):
        try:
            proc = subprocess.run(
                [sys.executable,
                 os.path.join(REPO, "benchmarks", "streaming_bench.py"),
                 "--model", "v3_ctc", "--init", "weights", "--minutes", "2",
                 "--download_root", args.root],
                capture_output=True, text=True, timeout=1800, cwd=REPO)
            line = next((ln for ln in reversed(proc.stdout.splitlines())
                         if ln.strip().startswith("{")), None)
            data = json.loads(line) if line else {}
            wer_s = data.get("streaming_vs_offline_wer")
            if proc.returncode != 0 or wer_s is None:
                failures.append(
                    f"streaming wer rc={proc.returncode}: "
                    f"{(proc.stderr or '')[-200:]}")
                section("streaming_wer", f"FAILED rc={proc.returncode}")
            else:
                # LocalAgreement-2 commits conservative prefixes; >15% drift
                # from the offline transcript means the policy is broken
                if wer_s > 0.15:
                    failures.append(f"streaming-vs-offline WER {wer_s:.3f}")
                section("streaming_wer",
                        "ok" if wer_s <= 0.15 else "FAILED",
                        streaming_vs_offline_wer=wer_s,
                        detail={k: v for k, v in data.items()
                                if k != "events"})
        except Exception as e:
            failures.append(f"streaming wer: {e}")
            section("streaming_wer", f"FAILED: {e}")

    # 6. optional WER table
    if args.manifest:
        from gigaam_tpu.train.eval import main as eval_main

        wer_rows = {}
        print(f"\n{'model':14s} {'WER%':>7s} {'ref%':>7s} {'delta':>7s}")
        for name in models:
            if "ssl" in name or name == "emo":
                continue
            out = os.path.join(args.root, f"preds_{name}.jsonl")
            try:
                eval_main(["--model_name", name, "--manifest", args.manifest,
                           "--out", out, "--download_root", args.root])
                with open(out + ".summary.json") as f:
                    wer = 100.0 * json.load(f)["wer_e2e"]
            except Exception as e:
                failures.append(f"eval {name}: {e}")
                print(f"{name:14s} eval FAILED ({e})")
                continue
            ref = REF_WER.get(name)
            delta = (wer - ref) if ref is not None else float("nan")
            wer_rows[name] = {"wer": round(wer, 2), "ref": ref,
                              "delta": round(delta, 2) if ref else None}
            flag = ""
            if ref is not None and delta > args.wer_tolerance:
                failures.append(
                    f"WER regression {name}: {wer:.1f} vs ref {ref:.1f}")
                flag = "  <-- REGRESSION"
            print(f"{name:14s} {wer:7.2f} "
                  f"{(ref if ref is not None else float('nan')):7.1f} "
                  f"{delta:+7.2f}{flag}")
        print("(ref = reference average over ITS 10 test sets — comparable "
              "only when the manifest covers the same data)")
        results["sections"]["wer_table"] = wer_rows

    results["pass"] = not failures
    results["failures"] = failures
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"\n[bundle] wrote {args.out}")

    print("\n== PARITY:", "FAIL" if failures else "PASS", "==")
    for f in failures:
        print("  -", f)
    return 1 if failures else 0


def _vad_realweights_parity(ckpt_path: str, cfg, params) -> float:
    """Max |speech-prob delta| between pyannote's own PyanNet forward and
    our converted JAX net on synthetic audio.  Raises ImportError when
    pyannote.audio is unavailable (caller records a clean skip)."""
    import numpy as np
    from pyannote.audio import Model  # ImportError -> skip

    from gigaam_tpu.models.vad_net import frame_logits
    from gigaam_tpu.vad import SAMPLE_RATE

    model = Model.from_pretrained(ckpt_path)
    model.eval()

    rng = np.random.default_rng(0)
    dur = 5 * SAMPLE_RATE
    tone = 0.3 * np.sin(2 * np.pi * 220 * np.arange(dur) / SAMPLE_RATE)
    wav = (tone * (rng.standard_normal(dur) * 0.2 + 1.0)).astype(np.float32)

    import torch

    with torch.no_grad():
        ref = model(torch.from_numpy(wav)[None, None, :]).numpy()[0]
    ours = np.asarray(frame_logits(params, wav[None, :], cfg))[0]
    # pyannote segmentation-3.0 emits multi-class powerset log-probs; the
    # VAD speech prob is 1 - P(silence-class); compare on the common grid
    n = min(ref.shape[0], ours.shape[0])
    p_ref = 1.0 - np.exp(ref[:n, 0])
    p_ours = 1.0 - np.exp(ours[:n, 0])
    return float(np.max(np.abs(p_ref - p_ours)))


if __name__ == "__main__":
    sys.exit(main())
