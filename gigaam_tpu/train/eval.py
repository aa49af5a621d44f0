"""Evaluation CLI (mirror of reference ``train_utils/eval.py``).

Batch-decodes a manifest, writes ``preds.jsonl``, reports dual WER:
e2e (verbatim) + raw (normalized Cyrillic-only), matching
``train_utils/utils.py:25-48``.

Usage:
  python -m gigaam_tpu.train.eval --model_name <preset|artifact|.ckpt> \\
      --manifest test.tsv [--batch_size 16] [--out preds.jsonl]
"""

from __future__ import annotations

import argparse
import json
from typing import List, Optional

import numpy as np


def main(argv: Optional[List[str]] = None) -> None:
    p = argparse.ArgumentParser(description="GigaAM-TPU evaluation")
    p.add_argument("--model_name", required=True)
    p.add_argument("--manifest", required=True)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--out", default="preds.jsonl")
    p.add_argument("--max_duration", type=float, default=None)
    p.add_argument("--beam_size", type=int, default=1,
                   help="beam width (1 = greedy; RNNT on-device beam / "
                        "CTC prefix beam)")
    p.add_argument("--lm", default=None,
                   help="n-gram LM (tools/train_lm.py npz) for shallow "
                        "fusion; requires --beam_size > 1")
    p.add_argument("--lm_weight", type=float, default=0.5)
    p.add_argument("--token_bonus", type=float, default=0.0,
                   help="per-token insertion bonus added with the LM score")
    p.add_argument("--download_root", default=None,
                   help="cache dir for named models (default "
                        "~/.cache/gigaam_tpu)")
    args = p.parse_args(argv)

    import gigaam_tpu
    from gigaam_tpu.data import AudioDataset
    from gigaam_tpu.metrics import compute_wer
    from gigaam_tpu.models.model import GigaAMASR

    model = gigaam_tpu.load_model(args.model_name,
                                  download_root=args.download_root)
    assert isinstance(model, GigaAMASR), "ASR model required"

    ds = AudioDataset(args.manifest, tokenizer=model.tokenizer,
                      max_duration=args.max_duration, return_tokens=False)

    from gigaam_tpu.data import prefetch_batches

    hyps: List[str] = []
    refs: List[str] = []
    idx = 0
    # pipeline with one batch of lookahead: batch i+1's audio prefetches
    # and its device work dispatches while batch i finalizes; pad_rows_to
    # keeps the ragged final batch on the same compiled graph
    pending = None
    for wavs_pad, lens in prefetch_batches(
            ds.batches(args.batch_size, sort_by_duration=False)):
        wav_list = [wavs_pad[i, : lens[i]] for i in range(len(lens))]
        finalize = model._decode_batch_submit(
            wav_list, word_timestamps=False, beam_size=args.beam_size,
            pad_rows_to=args.batch_size, lm=args.lm,
            lm_weight=args.lm_weight, token_bonus=args.token_bonus)
        if pending is not None:
            hyps.extend(t for t, _ in pending())
        pending = finalize
        for _ in range(len(lens)):
            refs.append(ds.samples[idx].text or "")
            idx += 1
    if pending is not None:
        hyps.extend(t for t, _ in pending())

    with open(args.out, "w") as f:
        for i, (h, r) in enumerate(zip(hyps, refs)):
            f.write(json.dumps(
                {"id": i, "prediction": h, "reference": r},
                ensure_ascii=False) + "\n")

    wer_e2e, wer_raw = compute_wer(hyps, refs)
    # machine-readable summary next to the preds (consumed by
    # tools/run_parity.py's WER table)
    with open(args.out + ".summary.json", "w") as f:
        json.dump({"samples": len(hyps), "wer_e2e": wer_e2e,
                   "wer_raw": wer_raw}, f)
    print(f"samples: {len(hyps)}")
    print(f"WER (e2e):  {100 * wer_e2e:.2f}%")
    print(f"WER (raw):  {100 * wer_raw:.2f}%")
    print(f"predictions written to {args.out}")


if __name__ == "__main__":
    main()
