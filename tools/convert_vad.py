#!/usr/bin/env python
"""Convert a pyannote segmentation checkpoint into a native VAD artifact.

Usage:
  python tools/convert_vad.py /path/to/pytorch_model.bin \
      --out ~/.cache/gigaam_tpu/vad_seg3

The output (<out>.npz, <out>.json) loads with
``gigaam_tpu.models.vad_net.load_vad`` and plugs into longform
transcription:

  fn = gigaam_tpu.models.vad_net.load_vad_regions_fn(out)
  model.transcribe_longform("podcast.wav", speech_regions_fn=fn)

torch (and optionally asteroid-filterbanks for exact sinc taps) is only
needed here, at conversion time — never at inference.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ckpt", help="pyannote PyanNet checkpoint "
                                 "(pytorch_model.bin / Lightning ckpt)")
    ap.add_argument(
        "--out",
        default=os.path.expanduser("~/.cache/gigaam_tpu/vad_segmentation"),
        help="output artifact base path (default: the location "
             "transcribe_longform auto-discovers, making the neural VAD "
             "the longform default — reference parity with "
             "gigaam/vad_utils.py:60-77)")
    args = ap.parse_args()

    from gigaam_tpu.checkpoint import convert_pyannote_vad
    from gigaam_tpu.models.vad_net import save_vad

    cfg, params = convert_pyannote_vad(args.ckpt)
    save_vad(args.out, cfg, params)
    print(f"Converted {args.ckpt} -> {args.out}.npz / {args.out}.json")
    print(f"  sinc_filters={cfg.sinc_filters} lstm={cfg.lstm_layers}x"
          f"{cfg.lstm_hidden} classes={cfg.n_classes}")


if __name__ == "__main__":
    main()
