"""Log-mel frontend, TPU-native.

Replaces the reference's torchaudio ``MelSpectrogram`` + ``SpecScaler``
(``gigaam/preprocess.py:43-98``) with an MXU-friendly formulation: framing +
(window-folded) real DFT as two matmuls + power + mel filterbank matmul +
log-clamp.  No FFT primitive is needed — for n_fft=400 the dense DFT matmul
maps straight onto the MXU systolic array and XLA fuses the elementwise tail.

Numerics contract with the reference:
  * Hann window, periodic, length ``win_length`` (torch.hann_window default).
  * ``center=True``: reflect-pad by n_fft//2 on both sides;
    ``center=False`` (v3): no padding.  (torch.stft semantics.)
  * power spectrum |X|^2, HTK mel scale, no filterbank norm
    (torchaudio ``MelSpectrogram`` defaults).
  * log(clamp(x, 1e-9, 1e9))  (``gigaam/preprocess.py:49-50``).
  * output length: center ? len//hop + 1 : (len - win)//hop + 1
    (``gigaam/preprocess.py:78-92``).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import FeaturesConfig


def hz_to_mel_htk(freq: np.ndarray) -> np.ndarray:
    return 2595.0 * np.log10(1.0 + np.asarray(freq, dtype=np.float64) / 700.0)


def mel_to_hz_htk(mel: np.ndarray) -> np.ndarray:
    return 700.0 * (10.0 ** (np.asarray(mel, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(
    n_freqs: int,
    n_mels: int,
    sample_rate: int,
    f_min: float = 0.0,
    f_max: float | None = None,
) -> np.ndarray:
    """Triangular mel filterbank [n_freqs, n_mels], HTK scale, no norm.

    Matches torchaudio ``melscale_fbanks(..., norm=None, mel_scale="htk")``
    used by the reference preprocessor (``gigaam/preprocess.py:66-74``).
    """
    if f_max is None:
        f_max = sample_rate / 2.0
    all_freqs = np.linspace(0.0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(hz_to_mel_htk(f_min), hz_to_mel_htk(f_max), n_mels + 2)
    f_pts = mel_to_hz_htk(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]                       # [n_mels + 1]
    slopes = f_pts[None, :] - all_freqs[:, None]          # [n_freqs, n_mels+2]
    down = -slopes[:, :-2] / f_diff[:-1]                  # rising edge
    up = slopes[:, 2:] / f_diff[1:]                       # falling edge
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def hann_window_periodic(win_length: int) -> np.ndarray:
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))).astype(np.float32)


def _windowed_dft_matrices(n_fft: int, win_length: int) -> Tuple[np.ndarray, np.ndarray]:
    """Real-DFT basis with the Hann window folded in: frames @ C, frames @ S.

    Returns (cos_mat, sin_mat), each [n_fft, n_fft//2 + 1].
    """
    window = hann_window_periodic(win_length)
    if win_length < n_fft:  # center window inside the FFT frame (torch.stft)
        pad_l = (n_fft - win_length) // 2
        window = np.pad(window, (pad_l, n_fft - win_length - pad_l))
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_fft // 2 + 1, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    cos_mat = (np.cos(ang) * window[:, None]).astype(np.float32)
    sin_mat = (-np.sin(ang) * window[:, None]).astype(np.float32)
    return cos_mat, sin_mat


def num_frames(num_samples: int, cfg: FeaturesConfig) -> int:
    """Static frame count for a given waveform length.

    center=False frames span ``n_fft`` samples (torch.stft semantics), so
    the count uses max(n_fft, win_length) — the reference's formula uses
    ``win_length`` (``gigaam/preprocess.py:88``) but every shipped config
    has them equal; this form stays consistent with ``forward`` if they
    ever differ.
    """
    if cfg.center:
        return num_samples // cfg.hop_length + 1
    span = max(cfg.n_fft, cfg.win_length)
    return (num_samples - span) // cfg.hop_length + 1


def out_len(lengths: jnp.ndarray, cfg: FeaturesConfig) -> jnp.ndarray:
    """Valid feature length per sample (``gigaam/preprocess.py:78-92``).

    Clamped at 0: for center=False configs, audio shorter than one window
    (~25 ms) would otherwise yield a negative length that downstream
    consumers (masks, host slicing) must each defend against."""
    if cfg.center:
        return lengths // cfg.hop_length + 1
    span = max(cfg.n_fft, cfg.win_length)
    return jnp.maximum(0, (lengths - span) // cfg.hop_length + 1)


class LogMelFrontend:
    """Stateless feature extractor: wav [B, L] -> (logmel [B, F, T], lens).

    The per-config constants (windowed DFT basis, mel filterbank) are
    precomputed on host and closed over; the compute fn is pure and jittable.
    """

    def __init__(self, cfg: FeaturesConfig):
        self.cfg = cfg
        cos_mat, sin_mat = _windowed_dft_matrices(cfg.n_fft, cfg.win_length)
        fb = mel_filterbank(cfg.n_fft // 2 + 1, cfg.features, cfg.sample_rate)
        # Framing strategy: reshape the wav into hop-sized rows and build
        # each frame from ceil(n_fft/hop) *contiguous row slices* — pure
        # layout ops.  Both the index-gather formulation ([T, n_fft] fancy
        # index: ~7.5 ms / 160 s audio; XLA lowers it to scalar gathers) and
        # a 1-in-channel stride-hop conv (~10.7 ms; degenerate conv shape)
        # are TPU-hostile.  The DFT basis is zero-padded to the sliced frame
        # width so framing + windowed DFT is slice/concat + ONE MXU matmul.
        n_rows = -(-cfg.n_fft // cfg.hop_length)
        basis = np.concatenate([cos_mat, sin_mat], axis=1)  # [n_fft, 2K]
        pad_rows = n_rows * cfg.hop_length - cfg.n_fft
        self._n_rows = n_rows
        self._basis = jnp.asarray(
            np.pad(basis, ((0, pad_rows), (0, 0))))         # [rows*hop, 2K]
        self._fb = jnp.asarray(fb)

    def __call__(
        self, wavs: jnp.ndarray, lengths: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return self.forward(wavs, lengths)

    @partial(jax.jit, static_argnums=0)
    def forward(
        self, wavs: jnp.ndarray, lengths: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        wavs = wavs.astype(jnp.float32)
        if wavs.ndim == 1:
            wavs = wavs[None, :]
        if cfg.center:
            pad = cfg.n_fft // 2
            wavs = jnp.pad(wavs, ((0, 0), (pad, pad)), mode="reflect")
        # Framing via hop-rows + window-folded real DFT as one MXU matmul
        # (see __init__ for why not gather/conv).
        # Precision.HIGHEST: the MXU's default bf16 passes would cost ~1e-2
        # error in the log-mel (log amplifies small power errors); frontend
        # FLOPs are negligible vs the encoder so full fp32 matmuls are free.
        hop, n_rows = cfg.hop_length, self._n_rows
        n_samples = wavs.shape[1]
        t_frames = (n_samples - cfg.n_fft) // hop + 1
        rows_needed = t_frames - 1 + n_rows
        pad_to = rows_needed * hop
        if pad_to > n_samples:
            wavs = jnp.pad(wavs, ((0, 0), (0, pad_to - n_samples)))
        else:
            wavs = wavs[:, :pad_to]
        rows = wavs.reshape(wavs.shape[0], rows_needed, hop)
        frames = jnp.concatenate(
            [rows[:, i:i + t_frames] for i in range(n_rows)],
            axis=-1)                                       # [B, T, rows*hop]
        re_im = jnp.einsum("btn,nk->btk", frames, self._basis,
                           precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)
        re, im = jnp.split(re_im, 2, axis=-1)
        power = re * re + im * im                          # [B, T, n_freqs]
        mel = jnp.einsum("btk,km->btm", power, self._fb,
                         precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)
        logmel = jnp.log(jnp.clip(mel, 1e-9, 1e9))
        return jnp.transpose(logmel, (0, 2, 1)), out_len(lengths, cfg)
