"""Benchmark: v3_ctc encode+decode throughput on the local accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline metric = audio-seconds processed per wall-second per chip (RTF)
for the flagship v3_ctc pipeline (log-mel -> 16x Conformer(768) -> CTC head
-> greedy mask), batch 8 x 20 s, bf16, steady state.

Baseline anchor: the reference's best CUDA serving number — 65 s of audio in
0.036 s (v3_ctc, torch bs=4, ``triton_scripts/README.md:71-83``;
BASELINE.md "Implied RTF anchor") ~= 1806x realtime.  vs_baseline = ours /
1806.
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/gigaam_tpu/jax_cache"))

import numpy as np

BASELINE_RTF = 65.0 / 0.036  # ~1806x, reference CUDA serving anchor


def main() -> None:
    import jax
    import jax.numpy as jnp

    from gigaam_tpu import load_model
    from gigaam_tpu.models.model import pad_wav_batch

    batch_size = 8
    seconds = 20
    model = load_model("v3_ctc", init="random")

    rng = np.random.default_rng(0)
    wavs = [
        (0.1 * rng.standard_normal(16000 * seconds)).astype(np.float32)
        for _ in range(batch_size)
    ]
    batch, lens = pad_wav_batch(wavs)
    batch = jnp.asarray(batch)
    lens = jnp.asarray(lens)
    pos = model._pos_for(batch.shape[1])

    # Device-side loop of K forwards per dispatch: the remote-TPU tunnel
    # costs tens of ms per host round trip, which would dominate a
    # per-call measurement.  Each iteration perturbs the input (data
    # dependency on the loop counter) so XLA cannot CSE the body.
    K = 40

    @jax.jit
    def run_k(params, wavs_in, lens_in, pos_in):
        def body(i, acc):
            w = wavs_in + (1e-7 * i)
            labels, keep, enc_lens = model._ctc_forward_impl(
                params, w, lens_in, pos_in)
            return acc + labels.sum() + enc_lens.sum()

        return jax.lax.fori_loop(0, K, body, jnp.int32(0))

    # two distinct input buffers, alternated across dispatches: repeated
    # identical dispatches can hit a degenerate result-reuse fast path on
    # the remote-TPU plugin and report impossible numbers
    batches = [batch, batch + jnp.float32(1e-6)]
    jax.block_until_ready(batches)
    # consume the scalar via a D2H read: the remote-TPU plugin's
    # block_until_ready can return early on a degenerate fast path,
    # producing physically impossible timings; a value read cannot
    float(run_k(model.params, batches[0], lens, pos))
    float(run_k(model.params, batches[1], lens, pos))
    window_medians = []
    n = 0
    for _ in range(3):
        times = []
        for _ in range(5):
            b_in = batches[n % 2]
            n += 1
            t0 = time.perf_counter()
            float(run_k(model.params, b_in, lens, pos))
            times.append((time.perf_counter() - t0) / K)
        window_medians.append(float(np.median(times)))
        time.sleep(0.5)
    dt = min(window_medians)

    audio_seconds = batch_size * seconds
    rtf = audio_seconds / dt
    print(json.dumps({
        "metric": "v3_ctc_encode_decode_rtf",
        "value": round(rtf, 1),
        "unit": "audio-seconds/s/chip",
        "vs_baseline": round(rtf / BASELINE_RTF, 3),
    }))


if __name__ == "__main__":
    main()
