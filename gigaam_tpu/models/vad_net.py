"""PyanNet-style neural VAD in JAX (pyannote ``segmentation-3.0`` parity).

The reference's longform path runs the HF-gated pyannote segmentation model
through a ``VoiceActivityDetection`` pipeline (``gigaam/vad_utils.py:41-77``).
This module is the TPU-native equivalent of that network:

    wav -> InstanceNorm -> sinc-FIR conv (80 x 251, stride 10) -> |.|
        -> [MaxPool(3) -> InstanceNorm -> LeakyReLU]
        -> 2 x [Conv1d(60, k=5) -> MaxPool(3) -> InstanceNorm -> LeakyReLU]
        -> 4-layer BiLSTM(128) -> 2 x [Linear(128) -> LeakyReLU]
        -> Linear(n_classes) -> log_softmax            (powerset classes)

Design choices (TPU-first, not a torch port):

* The sinc filterbank is materialised to plain FIR taps at conversion time
  (they are a deterministic function of the learned ``low_hz_/band_hz_``
  parameters), so the hot path is one ordinary strided conv that XLA maps
  straight onto the MXU — no special sinc kernel at inference.
* The whole frame-classifier is a single jitted function over a fixed-size
  window batch; longform audio is cut into sliding windows host-side and
  classified in one batched device call (overlap-averaged), instead of
  pyannote's per-window loop.
* Bidirectional LSTM runs as two ``lax.scan`` passes per layer.

Speech binarisation follows pyannote's powerset convention: a frame is
speech iff the argmax class is not the empty set (class 0).  The chunk-merge
policy on top lives in ``gigaam_tpu.vad`` (reference
``gigaam/vad_utils.py:104-136``).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.lstm import lstm_cell

Params = Dict[str, object]

IN_EPS = 1e-5               # torch nn.InstanceNorm1d default


@dataclass(frozen=True)
class VADNetConfig:
    """Architecture hyperparameters (defaults = pyannote segmentation-3.0)."""

    sample_rate: int = 16000
    sinc_filters: int = 80
    sinc_kernel: int = 251
    sinc_stride: int = 10
    conv_channels: int = 60
    conv_kernel: int = 5
    n_conv_blocks: int = 2
    pool: int = 3
    lstm_hidden: int = 128
    lstm_layers: int = 4
    linear_hidden: int = 128
    linear_layers: int = 2
    # powerset over 3 speakers, <=2 simultaneous: {}, 3 singles, 3 pairs
    n_classes: int = 7
    # sliding-window inference (pyannote uses 10 s windows for seg-3.0)
    window_s: float = 10.0
    step_s: float = 5.0

    def receptive_field(self) -> Tuple[int, int]:
        """(kernel, stride) of one output frame in input samples."""
        k, s = self.sinc_kernel, self.sinc_stride
        k, s = k + (self.pool - 1) * s, s * self.pool
        for _ in range(self.n_conv_blocks):
            k = k + (self.conv_kernel - 1) * s
            k, s = k + (self.pool - 1) * s, s * self.pool
        return k, s

    def num_frames(self, n_samples: int) -> int:
        t = (n_samples - self.sinc_kernel) // self.sinc_stride + 1
        t = t // self.pool
        for _ in range(self.n_conv_blocks):
            t = t - (self.conv_kernel - 1)
            t = t // self.pool
        return t


# ---------------------------------------------------------------------------
# ops
# ---------------------------------------------------------------------------

def _instance_norm(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """InstanceNorm1d (affine, eval == train: stats are per-sample).

    x [B, T, C]; normalises over T per (sample, channel).
    """
    mean = x.mean(axis=1, keepdims=True)
    var = x.var(axis=1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + IN_EPS)
    return y * p["w"] + p["b"]


def _conv1d(x: jnp.ndarray, w: jnp.ndarray, b=None,
            stride: int = 1) -> jnp.ndarray:
    """VALID conv over time. x [B, T, Cin]; w [K, Cin, Cout]."""
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"))
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def _maxpool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Non-overlapping max pool over time (floor semantics, like torch)."""
    t = (x.shape[1] // k) * k
    return jax.lax.reduce_window(
        x[:, :t], -jnp.inf, jax.lax.max,
        window_dimensions=(1, k, 1), window_strides=(1, k, 1),
        padding="VALID")


def _leaky(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.leaky_relu(x)  # negative_slope=0.01 == torch default


def _bilstm(layers: List[Dict[str, Params]], x: jnp.ndarray) -> jnp.ndarray:
    """Torch-style stacked bidirectional LSTM.

    Each layer consumes the concat of both directions of the previous layer.
    x [B, T, D] -> [B, T, 2H].
    """
    for layer in layers:
        outs = []
        for direction, xs in (("fwd", x), ("bwd", jnp.flip(x, axis=1))):
            p = layer[direction]
            h0 = jnp.zeros((x.shape[0], p["w_hh"].shape[0]), x.dtype)

            def step(carry, x_t, p=p):
                h, c = carry
                h, c = lstm_cell(p, x_t, h, c)
                return (h, c), h

            _, seq = jax.lax.scan(step, (h0, h0), xs.transpose(1, 0, 2))
            seq = seq.transpose(1, 0, 2)
            outs.append(seq if direction == "fwd" else jnp.flip(seq, axis=1))
        x = jnp.concatenate(outs, axis=-1)
    return x


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def frame_logits(params: Params, wavs: jnp.ndarray,
                 cfg: VADNetConfig) -> jnp.ndarray:
    """wavs [B, T] float32 -> log-probs [B, T_frames, n_classes]."""
    x = wavs[:, :, None]                                 # [B, T, 1]
    x = _instance_norm(params["wav_norm"], x)
    x = _conv1d(x, params["sinc"]["taps"],
                stride=cfg.sinc_stride)                  # [B, T', F]
    x = jnp.abs(x)
    pool = cfg.pool
    x = _leaky(_instance_norm(params["norms"][0], _maxpool(x, pool)))
    for i, blk in enumerate(params["convs"]):
        x = _conv1d(x, blk["w"], blk["b"])
        x = _leaky(_instance_norm(params["norms"][i + 1], _maxpool(x, pool)))
    x = _bilstm(params["lstm"], x)
    for lin in params["linear"]:
        x = _leaky(jnp.dot(x, lin["w"]) + lin["b"])
    logits = jnp.dot(x, params["classifier"]["w"]) + params["classifier"]["b"]
    return jax.nn.log_softmax(logits, axis=-1)


def init_vad_params(key: jax.Array, cfg: VADNetConfig) -> Params:
    """Random init (tests / smoke runs; real weights come from the
    pyannote converter, ``gigaam_tpu.checkpoint.convert_pyannote_vad``)."""
    ks = iter(jax.random.split(key, 64))

    def lin(i, o):
        return {"w": jax.random.normal(next(ks), (i, o)) / np.sqrt(i),
                "b": jnp.zeros((o,))}

    def norm(c):
        return {"w": jnp.ones((c,)), "b": jnp.zeros((c,))}

    c = cfg.conv_channels
    convs = [{"w": jax.random.normal(
        next(ks), (cfg.conv_kernel,
                   cfg.sinc_filters if i == 0 else c, c)) * 0.05,
        "b": jnp.zeros((c,))} for i in range(cfg.n_conv_blocks)]
    h = cfg.lstm_hidden
    lstm = []
    for li in range(cfg.lstm_layers):
        d_in = c if li == 0 else 2 * h
        lstm.append({d: {"w_ih": jax.random.normal(next(ks), (d_in, 4 * h))
                         / np.sqrt(d_in),
                         "w_hh": jax.random.normal(next(ks), (h, 4 * h))
                         / np.sqrt(h),
                         "b": jnp.zeros((4 * h,))} for d in ("fwd", "bwd")})
    linear = []
    d = 2 * h
    for _ in range(cfg.linear_layers):
        linear.append(lin(d, cfg.linear_hidden))
        d = cfg.linear_hidden
    return {
        "wav_norm": norm(1),
        "sinc": {"taps": jax.random.normal(
            next(ks), (cfg.sinc_kernel, 1, cfg.sinc_filters)) * 0.02},
        "norms": [norm(cfg.sinc_filters)] + [norm(c)] * cfg.n_conv_blocks,
        "convs": convs,
        "lstm": lstm,
        "linear": linear,
        "classifier": lin(d, cfg.n_classes),
    }


# ---------------------------------------------------------------------------
# sliding-window inference
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg",))
def _window_probs(params: Params, windows: jnp.ndarray,
                  cfg: VADNetConfig) -> jnp.ndarray:
    return jnp.exp(frame_logits(params, windows, cfg))


def sliding_class_probs(
    params: Params, cfg: VADNetConfig, wav: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """Classify a full waveform with overlap-averaged sliding windows.

    Returns (probs [N, n_classes], frame_center_times [N] seconds).
    One batched device call covers all windows (vs pyannote's window loop).
    """
    wav = np.asarray(wav, dtype=np.float32)
    sr = cfg.sample_rate
    rf_k, rf_s = cfg.receptive_field()
    win = int(cfg.window_s * sr)
    # snap the hop to a whole number of output frames so every window's
    # frame grid aligns with the global one (exact overlap-averaging)
    step = max(rf_s, int(cfg.step_s * sr) // rf_s * rf_s)

    if len(wav) < rf_k:
        wav = np.pad(wav, (0, rf_k - len(wav)))
    audio_len = len(wav)
    if len(wav) <= win:
        # keep the canonical window length (zero-padded) so every clip
        # shorter than window_s shares ONE compiled graph instead of
        # recompiling per distinct duration; padded frames drop below
        starts = [0]
        wav = np.pad(wav, (0, win - len(wav)))
    else:
        # starts are multiples of step (itself a multiple of the frame hop),
        # keeping every window's frame grid aligned with the global one;
        # the final partial window is zero-padded
        starts = list(range(0, len(wav) - win + step, step))

    frames_per_win = cfg.num_frames(win)
    # classify in bounded mega-batches: materializing EVERY window of a
    # multi-hour recording at once would build a GB-scale host buffer and
    # device call (3 h ~= 2160 windows ~= 1.4 GB fp32).  Chunks pad to a
    # multiple of 8 so the set of compiled graphs stays small (8..64 rows)
    # while memory stays O(mega) regardless of recording length.
    n_win = len(starts)
    mega = 64
    probs_parts = []
    for c0 in range(0, n_win, mega):
        chunk = starts[c0:c0 + mega]
        n_pad = -len(chunk) % 8
        windows = np.zeros((len(chunk) + n_pad, win), dtype=np.float32)
        for i, s in enumerate(chunk):
            seg = wav[s:s + win]
            windows[i, :len(seg)] = seg
        p = np.asarray(_window_probs(params, jnp.asarray(windows), cfg))
        probs_parts.append(p[:len(chunk)])
    probs = np.concatenate(probs_parts, axis=0)

    n_frames = (starts[-1] // rf_s) + frames_per_win
    acc = np.zeros((n_frames, probs.shape[-1]), dtype=np.float64)
    cnt = np.zeros((n_frames, 1), dtype=np.float64)
    for i, s in enumerate(starts):
        f0 = s // rf_s
        acc[f0:f0 + frames_per_win] += probs[i]
        cnt[f0:f0 + frames_per_win] += 1.0
    avg = (acc / np.maximum(cnt, 1.0)).astype(np.float32)
    times = (np.arange(n_frames) * rf_s + rf_k / 2) / sr
    # the final (zero-padded) window classifies frames past the audio end:
    # an all-zero, bias-driven input can argmax to a speech class and
    # hallucinate regions beyond (or inverted around) the waveform — keep
    # only frames whose receptive field starts inside the audio
    keep = (np.arange(n_frames) * rf_s) < audio_len
    return avg[keep], times[keep]


def speech_regions(
    params: Params, cfg: VADNetConfig, wav: np.ndarray,
    min_duration_on: float = 0.0, min_duration_off: float = 0.0,
) -> List[Tuple[float, float]]:
    """Binarise frame probabilities into (start, end) speech regions.

    Powerset argmax binarisation (speech iff argmax != empty-set class),
    matching the reference pipeline instantiated with
    ``min_duration_on/off = 0.0`` (``gigaam/vad_utils.py:75``).
    """
    probs, times = sliding_class_probs(params, cfg, wav)
    speech = probs.argmax(axis=-1) != 0
    rf_k, rf_s = cfg.receptive_field()
    half = rf_s / cfg.sample_rate / 2
    total = len(wav) / cfg.sample_rate

    regions: List[Tuple[float, float]] = []
    start = None
    for i, s in enumerate(speech):
        if s and start is None:
            start = max(0.0, times[i] - half)
        elif not s and start is not None:
            regions.append((start, min(total, times[i - 1] + half)))
            start = None
    if start is not None:
        regions.append((start, total))

    if min_duration_off > 0 and regions:
        merged = [regions[0]]
        for s, e in regions[1:]:
            if s - merged[-1][1] < min_duration_off:
                merged[-1] = (merged[-1][0], e)
            else:
                merged.append((s, e))
        regions = merged
    if min_duration_on > 0:
        regions = [(s, e) for s, e in regions if e - s >= min_duration_on]
    return regions


def make_speech_regions_fn(params: Params, cfg: VADNetConfig):
    """Adapter for ``gigaam_tpu.vad.segment_audio_file(speech_regions_fn=)``."""
    return lambda wav: speech_regions(params, cfg, wav)


# ---------------------------------------------------------------------------
# artifact save/load (npz + json, same convention as ASR models)
# ---------------------------------------------------------------------------

def save_vad(path: str, cfg: VADNetConfig, params: Params) -> None:
    import dataclasses
    import json
    import os

    from .model import _flatten

    base = path[:-4] if path.endswith(".npz") else path
    os.makedirs(os.path.dirname(base) or ".", exist_ok=True)
    np.savez(base + ".npz", **_flatten(params))
    with open(base + ".json", "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2)


def load_vad(path: str) -> Tuple[VADNetConfig, Params]:
    """Load a ``save_vad`` artifact; returns (cfg, params)."""
    import json

    from .model import _unflatten

    base = path[:-4] if path.endswith(".npz") else path
    with open(base + ".json") as f:
        cfg = VADNetConfig(**json.load(f))
    with np.load(base + ".npz") as z:
        params = _unflatten({k: z[k] for k in z.files})
    return cfg, params


def load_vad_regions_fn(path: str):
    """One-call loader: artifact path -> ``speech_regions_fn`` closure."""
    cfg, params = load_vad(path)
    return make_speech_regions_fn(params, cfg)
