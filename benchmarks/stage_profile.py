"""Per-stage forward profiling on the real chip (round-3 headroom map).

Measures, at b8 and b32 x 20 s: frontend, conv2d subsampling, one Conformer
layer and its blocks (FFN / attention / conv module / LayerNorm), and the
full v3_ctc forward.  Uses ``device_timeit`` (chained K-loop) so the
tunneled dispatch overhead is amortized.

Usage: python benchmarks/stage_profile.py [--bs 8 32] [--seconds 20]

k values are sized so k x expected_time >> the ~25 ms per-dispatch
tunnel overhead (PERF.md "Measurement methodology gotchas"); with
k=20-60 every sub-ms measurement here was dominated by dispatch.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, nargs="+", default=[8, 32])
    ap.add_argument("--seconds", type=int, default=20)
    ap.add_argument("--only", type=str, nargs="*", default=None,
                    help="subset of: full frontend subsampling layer blocks")
    args = ap.parse_args()

    from gigaam_tpu import load_model
    from gigaam_tpu.models.encoder import _layer_forward
    from gigaam_tpu.models.model import pad_wav_batch
    from gigaam_tpu.ops.conformer_ops import (
        conformer_conv, ffn, layer_norm, striding_subsampling_conv2d)
    from gigaam_tpu.ops.attention import rotary_mha
    from gigaam_tpu.profiling import device_timeit

    model = load_model("v3_ctc", init="random")
    cfg = model.cfg.encoder
    enc_params = model.params["encoder"]
    results = {}

    for bs in args.bs:
        rng = np.random.default_rng(0)
        wavs = [(0.1 * rng.standard_normal(16000 * args.seconds)
                 ).astype(np.float32) for _ in range(bs)]
        batch, lens = pad_wav_batch(wavs)
        batch = jnp.asarray(batch)
        lens = jnp.asarray(lens)
        pos = model._pos_for(batch.shape[1])

        tag = f"b{bs}"
        res = {}

        # ---- full forward.  Params ride as a runtime argument, not a
        # closure constant: closed-over arrays serialize into the remote
        # compile request and 220M fp32 params overflow its body limit
        # (HTTP 413) — same constraint as __graft_entry__.entry.
        def full(p, w):
            labels, keep, _tok_lp, enc_lens = model._ctc_forward_impl(
                p, w, lens, pos)
            return labels, enc_lens

        def want(name):
            return args.only is None or name in args.only

        if want("full"):
            res["full_fwd_ms"] = device_timeit(
                full, [model.params, batch], perturb_arg=1, k=20) * 1e3
            print("full done", flush=True)

        # ---- frontend ([B, F, T] output; encoder takes [B, T, F])
        def frontend(w):
            return model.frontend.forward(w, lens)

        feats, flens = model.frontend.forward(batch, lens)
        feats = jnp.transpose(feats, (0, 2, 1)).astype(jnp.bfloat16)
        if want("frontend"):
            res["frontend_ms"] = device_timeit(frontend, [batch], k=400) * 1e3

        # ---- subsampling
        def subsamp(f):
            return striding_subsampling_conv2d(
                enc_params["pre_encode"], f, flens,
                cfg.num_subsampling_stages, cfg.subs_kernel_size)

        x, out_len = subsamp(feats)
        if want("subsampling"):
            res["subsampling_ms"] = device_timeit(subsamp, [feats], k=100) * 1e3
            print("subsampling done", flush=True)

        t = x.shape[1]
        valid = jnp.arange(t)[None, :] < out_len[:, None]
        lp = jax.tree.map(lambda a: a[0], enc_params["layers"])

        # ---- one full layer
        def layer(h):
            out, _ = _layer_forward(lp, h, pos, valid, cfg, False, None)
            return out

        if want("layer"):
            res["layer_ms"] = device_timeit(layer, [x], k=400, chain=True) * 1e3
            print("layer done", flush=True)

        # ---- blocks
        def ffn_block(h):
            return ffn(lp["feed_forward1"], h)

        def attn_block(h):
            cos, sin = pos
            return rotary_mha(lp["self_attn"], h, cos, sin, valid,
                              cfg.n_heads, use_fused=True) + h

        def attn_block_xla(h):
            cos, sin = pos
            return rotary_mha(lp["self_attn"], h, cos, sin, valid,
                              cfg.n_heads, use_fused=False) + h

        def conv_block(h):
            y, _ = conformer_conv(lp["conv"], h, valid, cfg.conv_norm_type)
            return y + h

        def ln_block(h):
            return layer_norm(lp["norm_out"], h)

        if want("blocks"):
            res["ffn_us"] = device_timeit(ffn_block, [x], k=600, chain=True) * 1e6
            print("ffn done", flush=True)
            res["attn_pallas_us"] = device_timeit(
                attn_block, [x], k=600, chain=True) * 1e6
            print("attn done", flush=True)
            if os.environ.get("STAGE_PROFILE_XLA_ATTN"):
                res["attn_xla_us"] = device_timeit(
                    attn_block_xla, [x], k=600, chain=True) * 1e6
            res["conv_module_us"] = device_timeit(
                conv_block, [x], k=600, chain=True) * 1e6
            print("conv done", flush=True)
            res["layer_norm_us"] = device_timeit(
                ln_block, [x], k=600, chain=True) * 1e6

        results[tag] = {k: round(v, 2) for k, v in res.items()}
        print(tag, json.dumps(results[tag]), flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
