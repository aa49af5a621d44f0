#!/usr/bin/env python
"""One-command golden-parity runbook (needs network + disk for the ckpts).

Downloads the reference checkpoints, converts them to native artifacts,
fetches the CDN example audio, optionally converts the pyannote VAD, then
runs the golden suite (``tests/test_golden.py``) and — when a manifest is
given — a WER evaluation per model with a table against the reference's
published numbers (BASELINE.md / reference ``evaluation.md:6-18``).

Usage:
  python tools/run_parity.py                         # partial: 4 flagship models
  python tools/run_parity.py --models all            # every registry entry
  python tools/run_parity.py --models v3_ctc,v3_rnnt
  python tools/run_parity.py --vad /path/to/pyannote/pytorch_model.bin
  python tools/run_parity.py --manifest test.tsv     # + WER table

Exit code 0 = everything available ran and matched; a nonzero exit means a
download, conversion, golden assertion, or WER regression failed.
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
                         "(enables the longform golden tests)")
    ap.add_argument("--manifest", default=None,
                    help="TSV manifest (path\\tduration\\ttext) for WER eval")
    ap.add_argument("--wer_tolerance", type=float, default=0.5,
                    help="allowed WER regression (abs %%-points) vs the "
                         "reference's published averages")
    ap.add_argument("--skip_tests", action="store_true",
                    help="only download/convert, don't run pytest")
    args = ap.parse_args()

    models = ALL if args.models == "all" else args.models.split(",")
    os.makedirs(args.root, exist_ok=True)
    failures = []

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
            print(f"[model] {name}: converted + loadable")
        except Exception as e:
            failures.append(f"model {name}: {e}")
            print(f"[model] {name}: FAILED ({e})")

    # 3. optional neural VAD conversion to the auto-discovery location
    if args.vad:
        try:
            from gigaam_tpu.checkpoint import convert_pyannote_vad
            from gigaam_tpu.models.vad_net import save_vad

            cfg, params = convert_pyannote_vad(args.vad)
            save_vad(os.path.join(args.root, "vad_segmentation"), cfg, params)
            print("[vad] converted -> vad_segmentation.npz")
        except Exception as e:
            failures.append(f"vad: {e}")
            print(f"[vad] FAILED ({e})")

    # 4. golden suite — the crosscheck first: it parses the reference's own
    # test sources and fails loudly if our golden constants drifted from
    # them, so a transcription typo can never masquerade as model disparity
    if not args.skip_tests:
        env = dict(os.environ,
                   GIGAAM_GOLDEN_ROOT=args.root, GIGAAM_GOLDEN="1")
        rc = subprocess.call(
            [sys.executable, "-m", "pytest",
             os.path.join(REPO, "tests", "test_golden_crosscheck.py"),
             "-v", "-rs"], env=env, cwd=REPO)
        if rc != 0:
            failures.append(f"golden crosscheck rc={rc} — expectations "
                            f"drifted from the reference test sources")
        rc = subprocess.call(
            [sys.executable, "-m", "pytest",
             os.path.join(REPO, "tests", "test_golden.py"),
             "-m", "golden", "-v", "-rs"], env=env, cwd=REPO)
        if rc != 0:
            failures.append(f"golden pytest rc={rc}")

    # 5. optional WER table
    if args.manifest:
        from gigaam_tpu.train.eval import main as eval_main

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

    print("\n== PARITY:", "FAIL" if failures else "PASS", "==")
    for f in failures:
        print("  -", f)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
