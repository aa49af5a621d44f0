"""Frontend numerics: STFT parity vs torch.stft, mel filterbank properties,
length formula, and batch behavior (SURVEY.md §7 step 2 parity gates)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gigaam_tpu.config import FeaturesConfig
from gigaam_tpu.frontend import (
    LogMelFrontend,
    hann_window_periodic,
    mel_filterbank,
    num_frames,
    out_len,
)

torch = pytest.importorskip("torch")


def _torch_logmel(wav: np.ndarray, cfg: FeaturesConfig, fb: np.ndarray) -> np.ndarray:
    """Reference pipeline rebuilt from torch core ops (torchaudio semantics:
    hann window, reflect-pad center, power 2 spectrum, mel matmul, log-clamp)."""
    x = torch.from_numpy(wav).float()
    spec = torch.stft(
        x,
        n_fft=cfg.n_fft,
        hop_length=cfg.hop_length,
        win_length=cfg.win_length,
        window=torch.hann_window(cfg.win_length, periodic=True),
        center=cfg.center,
        pad_mode="reflect",
        onesided=True,
        return_complex=True,
    )
    power = spec.abs() ** 2  # [F, T]
    mel = torch.from_numpy(fb).T @ power  # [n_mels, T]
    return torch.log(mel.clamp(1e-9, 1e9)).numpy()


@pytest.mark.parametrize("center", [True, False])
def test_logmel_matches_torch_stft(center):
    rng = np.random.default_rng(0)
    cfg = FeaturesConfig(center=center)
    wav = rng.standard_normal(16000 * 2 + 137).astype(np.float32) * 0.1
    fb = mel_filterbank(cfg.n_fft // 2 + 1, cfg.features, cfg.sample_rate)

    ref = _torch_logmel(wav, cfg, fb)

    fe = LogMelFrontend(cfg)
    ours, lens = fe(jnp.asarray(wav[None, :]), jnp.asarray([len(wav)]))
    ours = np.asarray(ours[0])

    assert ours.shape == ref.shape
    assert int(lens[0]) == ref.shape[1]
    # log-domain comparison; atol dominated by float32 DFT-matmul vs FFT.
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=0)


def test_out_len_formula():
    cfg_c = FeaturesConfig(center=True)
    cfg_n = FeaturesConfig(center=False)
    lens = jnp.asarray([16000, 16160, 400, 8000])
    np.testing.assert_array_equal(
        np.asarray(out_len(lens, cfg_c)), [101, 102, 3, 51]
    )
    np.testing.assert_array_equal(
        np.asarray(out_len(lens, cfg_n)), [98, 99, 1, 48]
    )
    assert num_frames(16000, cfg_c) == 101
    assert num_frames(16000, cfg_n) == 98
    # sub-window audio clamps at 0, never negative (center=False would
    # otherwise give (100-400)//160+1 = -1)
    np.testing.assert_array_equal(
        np.asarray(out_len(jnp.asarray([100, 0, 399]), cfg_n)), [0, 0, 0]
    )


def test_hann_window_matches_torch():
    ours = hann_window_periodic(400)
    ref = torch.hann_window(400, periodic=True).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_mel_filterbank_properties():
    fb = mel_filterbank(201, 64, 16000)
    assert fb.shape == (201, 64)
    assert fb.min() >= 0.0
    # every filter has positive mass and a single triangular peak
    assert (fb.sum(axis=0) > 0).all()
    peaks = fb.argmax(axis=0)
    # peaks non-decreasing (low-mel triangles can be narrower than a bin)
    assert (np.diff(peaks) >= 0).all()
    assert peaks[-1] > peaks[0]
    # interior frequency bins are covered by the partition of triangles
    interior = fb[10:190].sum(axis=1)
    assert (interior > 0).all()


def test_batched_matches_single():
    rng = np.random.default_rng(1)
    cfg = FeaturesConfig()
    w1 = rng.standard_normal(16000).astype(np.float32) * 0.1
    w2 = rng.standard_normal(9000).astype(np.float32) * 0.1
    fe = LogMelFrontend(cfg)

    batch = np.zeros((2, 16000), dtype=np.float32)
    batch[0] = w1
    batch[1, :9000] = w2
    mel_b, lens_b = fe(jnp.asarray(batch), jnp.asarray([16000, 9000]))
    mel_1, _ = fe(jnp.asarray(w2[None, :]), jnp.asarray([9000]))

    # Only frames whose window lies fully inside the valid signal can match:
    # the batched tail sees zero padding where the single-sample run sees
    # reflect padding (same boundary effect the reference re-masks after
    # subsampling, ``gigaam/encoder.py:92-109``).
    t_interior = (9000 - cfg.n_fft // 2) // cfg.hop_length
    np.testing.assert_allclose(
        np.asarray(mel_b[1, :, :t_interior]),
        np.asarray(mel_1[0, :, :t_interior]),
        atol=1e-4,
    )
