#!/usr/bin/env python
"""Export a HuggingFace audio dataset to WAVs + a TSV manifest.

Mirror of the reference's ToneBooks exporter
(``train_utils/utils.py:80-113``): downloads a dataset split, writes 16 kHz
mono WAVs, and emits the ``path\\tduration\\ttranscription`` manifest that
``gigaam_tpu.data.AudioDataset`` consumes.

Requires the ``datasets`` package (not part of the core runtime).

Usage:
  python tools/export_hf_dataset.py --dataset voxblink/ToneBooks \\
      --split train --audio-column audio --text-column text \\
      --out data/tonebooks
"""

from __future__ import annotations

import argparse
import os
import sys
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def export_dataset(ds, out: str, audio_column: str = "audio",
                   text_column: str = "text", workers: int = 8,
                   limit: int = 0) -> str:
    """Write a dataset's rows as WAVs + manifest; returns the manifest path.

    ``ds`` is any indexable with ``__len__`` whose rows map column names to
    values, with the audio column holding ``{"array": ...}`` — the
    HF ``datasets`` shape (kept duck-typed so the export logic is testable
    without the network-gated package).
    """
    from gigaam_tpu.audio import save_wav
    from gigaam_tpu.config import SAMPLE_RATE
    from gigaam_tpu.data import write_manifest

    os.makedirs(os.path.join(out, "wavs"), exist_ok=True)
    n = min(limit, len(ds)) if limit else len(ds)

    def export(i):
        row = ds[i]
        wav = np.asarray(row[audio_column]["array"], dtype=np.float32)
        # manifest rows are relative to the manifest's own directory
        # (AudioDataset resolves them that way) — the exported tree stays
        # relocatable
        rel = os.path.join("wavs", f"{i:07d}.wav")
        save_wav(os.path.join(out, rel), wav)
        return (rel, len(wav) / SAMPLE_RATE, str(row[text_column]))

    with ThreadPoolExecutor(max_workers=workers) as ex:
        rows = list(ex.map(export, range(n)))

    manifest = os.path.join(out, "manifest.tsv")
    write_manifest(manifest, rows)
    hours = sum(r[1] for r in rows) / 3600
    print(f"exported {len(rows)} samples ({hours:.2f} h) -> {manifest}")
    return manifest


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--config", default=None)
    ap.add_argument("--split", default="train")
    ap.add_argument("--audio-column", default="audio")
    ap.add_argument("--text-column", default="text")
    ap.add_argument("--out", required=True)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--limit", type=int, default=0)
    args = ap.parse_args()

    try:
        from datasets import Audio, load_dataset
    except ImportError:
        raise SystemExit(
            "The 'datasets' package is required: pip install datasets")

    from gigaam_tpu.config import SAMPLE_RATE

    ds = load_dataset(args.dataset, args.config, split=args.split)
    ds = ds.cast_column(args.audio_column, Audio(sampling_rate=SAMPLE_RATE))
    export_dataset(ds, args.out, args.audio_column, args.text_column,
                   args.workers, args.limit)


if __name__ == "__main__":
    main()
