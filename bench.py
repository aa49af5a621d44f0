"""Benchmark: v3_ctc encode+decode throughput on the local accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Headline metric = audio-seconds processed per wall-second per chip (RTF)
for the flagship v3_ctc pipeline (log-mel -> 16x Conformer(768) -> CTC head
-> greedy mask) at the serving batch (32 x 20 s), bf16, steady state.
The JSON also carries MFU and a per-batch-size detail block.

Baseline anchor: the reference's best CUDA serving number — 65 s of audio in
0.036 s (v3_ctc, torch bs=4, ``triton_scripts/README.md:71-83``;
BASELINE.md "Implied RTF anchor") ~= 1806x realtime.  vs_baseline = ours /
1806.

Reliability: the remote-TPU backend ('axon' tunnel) can be transiently
unavailable — and worse, backend init can HANG indefinitely (observed: a
bare ``jax.devices()`` blocking > 9 min).  JAX caches a failed backend init
per process, so the retry unit must be a *process*: the outer ``main()``
re-execs this file as a subprocess with a hard deadline, retries with
backoff, and on final failure still prints the one-line JSON with an
``"error"`` field (exit 0 so the driver records the diagnostics).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BASELINE_RTF = 65.0 / 0.036  # ~1806x, reference CUDA serving anchor
METRIC = "v3_ctc_encode_decode_rtf"
UNIT = "audio-seconds/s/chip"

# TPU v5e peak bf16 throughput (per chip).  MFU is reported against this;
# adjust via env if the driver runs on a different generation.
PEAK_TFLOPS = float(os.environ.get("GIGAAM_PEAK_TFLOPS", "197"))


# ---------------------------------------------------------------------------
# Analytic FLOPs model (one forward of the v3_ctc pipeline)
# ---------------------------------------------------------------------------

def _subsampled(t: int, stages: int = 2, k: int = 3) -> int:
    import math
    pad = (k - 1) // 2
    for _ in range(stages):
        t = math.floor((t + 2 * pad - k) / 2 + 1.0)
    return t


def pipeline_flops(batch: int, wav_len: int, *, d: int = 768, layers: int = 16,
                   heads: int = 16, d_ff: int = 3072, conv_k: int = 31,
                   vocab: int = 34, n_mels: int = 64, n_fft: int = 400,
                   hop: int = 160, center: bool = False,
                   rel_pos: bool = False) -> float:
    """FLOPs of one v3_ctc forward (multiply-add = 2 FLOPs).

    Mirrors the architecture of ``gigaam_tpu/models/encoder.py`` (reference
    ``gigaam/encoder.py:510-525``): matmul-DFT frontend, 2-stage conv2d
    subsampling (channels = d_model), macaron Conformer layers, CTC head.
    """
    import math
    b = batch
    if center:
        t_feat = math.floor(wav_len / hop) + 1
    else:
        t_feat = math.floor((wav_len - n_fft) / hop) + 1

    # frontend: one fp32 matmul [B*T_feat, 3*hop] x [3*hop, 2*(n_fft//2+1)]
    # + mel projection [.., n_freq] x [n_freq, n_mels]
    n_freq = n_fft // 2 + 1
    fl = 2.0 * b * t_feat * (3 * hop) * (2 * n_freq)
    fl += 2.0 * b * t_feat * n_freq * n_mels

    # conv2d subsampling: stage convs stride (2,2), channels 1->d->d,
    # then Linear (d * n_mels/4 -> d)
    t1, f1 = _subsampled(t_feat, 1), _subsampled(n_mels, 1)
    t2, f2 = _subsampled(t_feat, 2), _subsampled(n_mels, 2)
    fl += 2.0 * b * t1 * f1 * 9 * 1 * d
    fl += 2.0 * b * t2 * f2 * 9 * d * d
    fl += 2.0 * b * t2 * (d * f2) * d

    t = t2
    # per Conformer layer
    per = 0.0
    per += 2 * (2.0 * b * t * d * d_ff * 2)          # two macaron FFNs
    per += 4 * (2.0 * b * t * d * d)                 # QKV + out projections
    per += 2 * (2.0 * b * t * t * d)                 # scores + AV
    if rel_pos:
        per += 2.0 * b * t * (2 * t - 1) * d         # positional matmul
    per += 2.0 * b * t * d * (2 * d)                 # conv pointwise 1 (GLU)
    per += 2.0 * b * t * d * conv_k                  # depthwise
    per += 2.0 * b * t * d * d                       # conv pointwise 2
    fl += layers * per

    fl += 2.0 * b * t * d * vocab                    # CTC head
    return fl


def train_step_flops(batch: int, wav_len: int, *, remat: str = "full",
                     rel_pos: bool = False, head: str = "ctc",
                     u_len: int = 32, vocab: int = 34,
                     pred_hidden: int = 320, joint_hidden: int = 320,
                     d: int = 768, codebook: int = 8192) -> dict:
    """Analytic FLOPs for one fine-tune/pretrain step (round-4 verdict #4).

    Returns {"model": F_model, "hardware": F_hw}:

    * ``model`` — the conventional MFU numerator: 3x the forward (backward
      contributes ~2x: one grad-vs-activations and one grad-vs-weights
      matmul per forward matmul), PLUS the head/loss term, EXCLUDING
      rematerialization recompute.
    * ``hardware`` — what the chip actually executes: under
      ``remat="full"`` the whole per-layer forward is recomputed in the
      backward (+1x the layer stack); ``"dots"`` saves matmul outputs so
      only elementwise work is recomputed (~0 extra matmul FLOPs).

    MFU = model / t / peak;  HFU = hardware / t / peak.
    """
    fwd = pipeline_flops(batch, wav_len, rel_pos=rel_pos, vocab=vocab)
    fwd_nonlayer = pipeline_flops(batch, wav_len, rel_pos=rel_pos,
                                  vocab=vocab, layers=0)
    fwd_layers = fwd - fwd_nonlayer

    extra = 0.0
    t_enc = _subsampled(
        (wav_len - 400) // 160 + 1 if wav_len >= 400 else 0, 2)
    if head == "rnnt":
        # teacher-forced joint over the [B, T, U+1] lattice (chunked in
        # time on-device, but the FLOPs are the same): enc/pred projections
        # into joint_hidden + the joint output matmul + the prediction-net
        # LSTM (4 gates x input/recurrent matmuls), fwd+bwd.  The
        # production config has joint_hidden == pred_hidden == 320 but the
        # two are distinct knobs (``config.py::RNNTJointConfig``).
        joint = 2.0 * batch * t_enc * (u_len + 1) * joint_hidden * vocab
        joint += 2.0 * batch * t_enc * d * joint_hidden           # enc proj
        joint += 2.0 * batch * (u_len + 1) * pred_hidden * joint_hidden
        joint += 2.0 * batch * (u_len + 1) * pred_hidden * pred_hidden * 4 * 2
        extra = 3.0 * joint
    elif head == "bestrq":
        extra = 3.0 * (2.0 * batch * t_enc * d * codebook)

    model = 3.0 * fwd + extra
    hardware = model + (fwd_layers if remat == "full" else 0.0)
    return {"model": model, "hardware": hardware}


# ---------------------------------------------------------------------------
# Inner bench (runs in a subprocess with the real backend)
# ---------------------------------------------------------------------------

def _synth_batch(batch_size: int, seconds: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gigaam_tpu.models.model import pad_wav_batch

    rng = np.random.default_rng(0)
    wavs = [
        (0.1 * rng.standard_normal(16000 * seconds)).astype(np.float32)
        for _ in range(batch_size)
    ]
    batch, lens = pad_wav_batch(wavs)
    batch = jnp.asarray(batch)
    lens = jnp.asarray(lens)
    jax.block_until_ready(batch)
    return batch, lens


def _measure(model, batch_size: int, seconds: int, k: int = 40):
    """Median per-forward wall time for one batch size.

    Delegates to ``gigaam_tpu.profiling.device_timeit``, the repo's single
    home for the remote-TPU measurement lore (device-side K-loop with
    input perturbation, alternating physical buffers, D2H consumption of
    an all-leaves anchor — see its docstring and docs/PERF.md).
    """
    from gigaam_tpu.profiling import device_timeit

    batch, lens = _synth_batch(batch_size, seconds)
    pos = model._pos_for(batch.shape[1])
    return device_timeit(
        model._ctc_forward_impl, (model.params, batch, lens, pos),
        perturb_arg=1, k=k)


def _measure_rnnt(model, batch_size: int, seconds: int):
    """(encoder_s, decode_s) for the v3_rnnt pipeline at one batch size.

    The joint output is biased toward blank so the on-device label loop
    runs the ~T-iteration trip count a *trained* checkpoint exhibits: a
    random-weight joint argmaxes to non-blank nearly every step and burns
    the full ``max_symbols_per_step`` budget — a ~10x RTF understatement
    (docs/PERF.md "Random weights are not a workload").
    """
    import jax
    import jax.numpy as jnp

    from gigaam_tpu.decode.rnnt_greedy import rnnt_greedy_decode
    from gigaam_tpu.profiling import device_timeit

    head = jax.tree.map(lambda x: x, model.params["head"])
    b_out = head["joint"]["out"]["b"]
    head["joint"]["out"]["b"] = b_out.at[b_out.shape[0] - 1].add(1e4)

    batch, lens = _synth_batch(batch_size, seconds)
    pos = model._pos_for(batch.shape[1])

    dt_enc = device_timeit(
        model._encode_impl, (model.params, batch, lens, pos),
        perturb_arg=1, k=20, windows=2, reps=4)

    enc, enc_lens = jax.jit(model._encode_impl)(model.params, batch, lens,
                                                pos)
    enc = enc.astype(jnp.float32)
    jax.block_until_ready(enc)

    dt_dec = device_timeit(
        lambda h, e, el: rnnt_greedy_decode(h, e, el),
        (head, enc, enc_lens), perturb_arg=1, k=10, windows=2, reps=4)
    return dt_enc, dt_dec


def inner_main() -> None:
    import jax
    import jax.numpy as jnp

    # pre-flight: force backend init + a trivial compile before touching the
    # 220M-param model, so transient backend failures surface fast
    x = jnp.ones((256, 256), dtype=jnp.bfloat16)
    jax.block_until_ready(jax.jit(lambda a: a @ a)(x))
    print(f"preflight ok: {jax.default_backend()}", file=sys.stderr, flush=True)

    from gigaam_tpu import load_model

    model = load_model("v3_ctc", init="random")
    seconds = 20
    detail = {}
    for bs in (8, 32):
        dt = _measure(model, bs, seconds)
        rtf = bs * seconds / dt
        mfu = pipeline_flops(bs, 16000 * seconds) / dt / (PEAK_TFLOPS * 1e12)
        detail[f"bs{bs}"] = {"rtf": round(rtf, 1), "mfu": round(mfu, 4),
                             "ms_per_fwd": round(dt * 1e3, 2)}

    # Both decoder families and both attention families, driver-captured
    # (round-4 verdict: the RNNT / rel-pos numbers previously lived only in
    # self-reported benchmark artifacts).  Fail-soft: a failure here must
    # not cost the headline metric.
    import gc

    del model
    gc.collect()
    try:
        rnnt = load_model("v3_rnnt", init="random")
        bs = 32
        dt_enc, dt_dec = _measure_rnnt(rnnt, bs, seconds)
        dt = dt_enc + dt_dec
        detail["v3_rnnt_bs32"] = {
            "rtf": round(bs * seconds / dt, 1),
            "encoder_ms": round(dt_enc * 1e3, 2),
            "decode_ms": round(dt_dec * 1e3, 2),
            "encoder_mfu": round(
                pipeline_flops(bs, 16000 * seconds, vocab=0) / dt_enc
                / (PEAK_TFLOPS * 1e12), 4),
        }
        del rnnt
        gc.collect()
    except Exception as e:  # noqa: BLE001 - diagnostics over hard failure
        detail["v3_rnnt_bs32"] = {"error": f"{type(e).__name__}: {e}"[:200]}
    try:
        v2 = load_model("v2_ctc", init="random")
        bs = 8
        dt = _measure(v2, bs, seconds, k=20)
        detail["v2_ctc_bs8"] = {
            "rtf": round(bs * seconds / dt, 1),
            "ms_per_fwd": round(dt * 1e3, 2),
            "mfu": round(
                pipeline_flops(bs, 16000 * seconds, rel_pos=True) / dt
                / (PEAK_TFLOPS * 1e12), 4),
        }
        del v2
        gc.collect()
    except Exception as e:  # noqa: BLE001
        detail["v2_ctc_bs8"] = {"error": f"{type(e).__name__}: {e}"[:200]}

    # the headline is ALWAYS the serving batch (bs=32) so the metric keeps
    # a stable meaning across rounds; bs=8 stays in detail for comparison
    head = detail["bs32"]
    print(json.dumps({
        "metric": METRIC,
        "value": head["rtf"],
        "unit": UNIT,
        "vs_baseline": round(head["rtf"] / BASELINE_RTF, 3),
        "mfu": head["mfu"],
        "headline_batch": 32,
        "peak_tflops_assumed": PEAK_TFLOPS,
        "detail": detail,
    }))


# ---------------------------------------------------------------------------
# Outer wrapper: subprocess isolation + retry/backoff
# ---------------------------------------------------------------------------

ATTEMPTS = int(os.environ.get("GIGAAM_BENCH_ATTEMPTS", "4"))
ATTEMPT_TIMEOUT = float(os.environ.get("GIGAAM_BENCH_TIMEOUT", "1500"))
BACKOFF_SEC = float(os.environ.get("GIGAAM_BENCH_BACKOFF", "60"))


def main() -> None:
    if os.environ.get("_GIGAAM_BENCH_INNER") == "1":
        inner_main()
        return

    env = dict(os.environ)
    env["_GIGAAM_BENCH_INNER"] = "1"
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.expanduser("~/.cache/gigaam_tpu/jax_cache"))

    last_err = ""
    for attempt in range(ATTEMPTS):
        if attempt:
            time.sleep(BACKOFF_SEC)
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True,
                timeout=ATTEMPT_TIMEOUT,
                cwd=os.path.dirname(os.path.abspath(__file__)) or None,
            )
        except subprocess.TimeoutExpired:
            last_err = (f"attempt {attempt + 1}: timed out after "
                        f"{ATTEMPT_TIMEOUT:.0f}s (backend init can hang)")
            print(last_err, file=sys.stderr, flush=True)
            continue
        for line in (proc.stdout or "").splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    obj = json.loads(line)
                except ValueError:
                    continue
                if obj.get("metric") == METRIC:
                    if attempt:
                        obj["attempts"] = attempt + 1
                    print(json.dumps(obj))
                    return
        tail = (proc.stderr or "").strip().splitlines()[-6:]
        last_err = f"attempt {attempt + 1}: rc={proc.returncode}: " + \
            " | ".join(t.strip()[:160] for t in tail)
        print(last_err, file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": METRIC,
        "value": 0.0,
        "unit": UNIT,
        "vs_baseline": 0.0,
        "error": last_err[:500] or "all attempts failed with no diagnostics",
        "attempts": ATTEMPTS,
    }))


if __name__ == "__main__":
    main()
