#!/usr/bin/env python
"""Train an n-gram LM for shallow-fusion decoding from manifest text.

Usage:
  python tools/train_lm.py --manifest train.tsv --out lm.npz --order 3
  python tools/train_lm.py --text corpus.txt --sp_model tokenizer.model \
      --out lm.npz --order 2

Then decode with it:
  model.transcribe(wav, beam_size=8, lm="lm.npz", lm_weight=0.5)
  python -m gigaam_tpu.train.eval --model_name v3_ctc ... \
      --beam_size 8 --lm lm.npz

The LM is an interpolated Witten-Bell n-gram over the model's token ids
(``gigaam_tpu/decode/lm.py``).  The token space must match the decoding
model: default is the char-wise Russian vocabulary (all non-e2e,
non-v1_rnnt models); pass ``--sp_model`` for SentencePiece models or
``--model`` to resolve the tokenizer exactly as ``load_model`` would.

This is an extension over the reference (GigaAM decodes purely
acoustically); no reference analogue exists.
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def iter_texts(args):
    if args.manifest:
        for path in args.manifest:
            with open(path, newline="") as f:
                reader = csv.DictReader(
                    f, fieldnames=["path", "duration", "transcription"],
                    delimiter="\t")
                for row in reader:
                    text = (row.get("transcription") or "").strip()
                    if text:
                        yield text
    if args.text:
        for path in args.text:
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        yield line


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--manifest", action="append", default=[],
                    help="TSV manifest (path\\tduration\\ttranscription); "
                         "repeatable")
    ap.add_argument("--text", action="append", default=[],
                    help="plain text file, one sentence per line; repeatable")
    ap.add_argument("--out", required=True, help="output LM path (.npz)")
    ap.add_argument("--order", type=int, default=3,
                    help="n-gram order (3 = trigram). On-device RNNT "
                         "fusion uses a dense table when small (char "
                         "vocabs <=4-gram) and a sparse counted-contexts "
                         "table otherwise (SP vocabs trigram+)")
    ap.add_argument("--sp_model", default=None,
                    help="SentencePiece .model for e2e/v1_rnnt vocabularies")
    ap.add_argument("--model", default=None,
                    help="resolve the tokenizer from a model name/ckpt "
                         "(downloads/converts as load_model would)")
    args = ap.parse_args()
    if not args.manifest and not args.text:
        ap.error("need at least one --manifest or --text")

    from gigaam_tpu.config import RU_VOCAB
    from gigaam_tpu.data import normalize_text
    from gigaam_tpu.decode.lm import train_lm_from_texts
    from gigaam_tpu.decode.tokenizer import Tokenizer

    if args.model:
        import gigaam_tpu

        tokenizer = gigaam_tpu.load_model(args.model).tokenizer
    elif args.sp_model:
        tokenizer = Tokenizer([], model_path=args.sp_model)
    else:
        tokenizer = Tokenizer(list(RU_VOCAB))

    vocab = tokenizer.vocab if tokenizer.charwise else None

    def texts():
        n = 0
        for text in iter_texts(args):
            n += 1
            yield normalize_text(text, vocab, raw_text=tokenizer.charwise)
        if n == 0:
            raise SystemExit("no text found in the given sources")

    lm = train_lm_from_texts(texts(), tokenizer, order=args.order)
    lm.save(args.out)
    print(f"saved order-{lm.order} LM over {lm.vocab_size} tokens "
          f"({lm.num_counted_ngrams()} counted n-grams) -> {args.out}")


if __name__ == "__main__":
    main()
