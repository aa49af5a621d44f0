#!/usr/bin/env python
"""Convert a reference GigaAM torch .ckpt into a native npz+json artifact.

Usage:
  python tools/convert_checkpoint.py /path/to/v3_ctc.ckpt \
      --out ~/.cache/gigaam_tpu/v3_ctc [--model-name v3_ctc] \
      [--tokenizer /path/to/tokenizer.model]

The output pair (<out>.npz, <out>.json) is loadable with
``gigaam_tpu.load_model(<out>)`` — torch is only needed here, at
conversion time.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ckpt", help="reference .ckpt path")
    ap.add_argument("--out", required=True, help="output artifact base path")
    ap.add_argument("--model-name", default=None)
    ap.add_argument("--tokenizer", default=None,
                    help="sentencepiece .model path (v1_rnnt / e2e models)")
    args = ap.parse_args()

    from gigaam_tpu.checkpoint import convert_reference_checkpoint
    from gigaam_tpu.models.model import model_class_for, save_model

    cfg, params = convert_reference_checkpoint(args.ckpt, args.model_name)
    if args.tokenizer and cfg.decoding is not None:
        cfg.decoding.model_path = args.tokenizer
    model = model_class_for(cfg)(cfg, params=params)
    save_model(model, args.out)
    print(f"Converted {args.ckpt} -> {args.out}.npz / {args.out}.json")
    print(f"  model_class={cfg.model_class} encoder="
          f"{cfg.encoder.n_layers}x{cfg.encoder.d_model} "
          f"attention={cfg.encoder.self_attention_model}")


if __name__ == "__main__":
    main()
