"""Audio-reading and short-input edge cases (reference analogues:
``tests/test_reading.py``, ``tests/test_batching.py:126-159`` very-short
sequences, ``tests/test_longform.py:208-225`` sub-second segment)."""

import struct
import wave

import numpy as np
import pytest

import jax.numpy as jnp

import gigaam_tpu
from gigaam_tpu.audio import load_audio, save_wav
from gigaam_tpu.models.model import GigaAMASR

from test_training import tiny_cfg

SR = gigaam_tpu.SAMPLE_RATE


@pytest.fixture(scope="module")
def tiny_ctc_model():
    return GigaAMASR(tiny_cfg("ctc"), seed=0, compute_dtype=jnp.float32)


def _write_wav(path, data, sr, sampwidth=2, channels=1):
    with wave.open(str(path), "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(sampwidth)
        wf.setframerate(sr)
        if sampwidth == 2:
            ints = np.clip(data * 32768.0, -32768, 32767).astype("<i2")
            wf.writeframes(ints.tobytes())
        else:
            raise NotImplementedError


def test_stereo_wav_downmixes(tmp_path):
    t = np.arange(SR) / SR
    left = 0.5 * np.sin(2 * np.pi * 440 * t).astype(np.float32)
    right = 0.5 * np.sin(2 * np.pi * 880 * t).astype(np.float32)
    inter = np.empty(2 * len(left), np.float32)
    inter[0::2], inter[1::2] = left, right
    p = tmp_path / "stereo.wav"
    _write_wav(p, inter, SR, channels=2)
    wav = load_audio(str(p))
    assert wav.ndim == 1 and len(wav) == SR
    np.testing.assert_allclose(wav, (left + right) / 2, atol=1e-3)


def test_8k_wav_resampled_to_16k(tmp_path):
    sr_in = 8000
    t = np.arange(sr_in) / sr_in
    tone = 0.4 * np.sin(2 * np.pi * 440 * t).astype(np.float32)
    p = tmp_path / "8k.wav"
    _write_wav(p, tone, sr_in)
    wav = load_audio(str(p))
    assert abs(len(wav) - SR) <= 2
    # dominant frequency preserved
    spec = np.abs(np.fft.rfft(wav * np.hanning(len(wav))))
    peak_hz = np.argmax(spec) * SR / len(wav)
    assert abs(peak_hz - 440) < 5


@pytest.mark.parametrize("n_samples", [400, 1600, 4000])
def test_very_short_transcribe(tiny_ctc_model, tmp_path, n_samples):
    """Sub-second inputs must flow through subsampling without crashing
    (reference ``tests/test_batching.py:126-159``)."""
    p = str(tmp_path / "short.wav")
    save_wav(p, (0.1 * np.random.default_rng(0)
                 .standard_normal(n_samples)).astype(np.float32))
    res = tiny_ctc_model.transcribe(p, word_timestamps=True)
    assert isinstance(res.text, str)


def test_short_batch_matches_single(tiny_ctc_model):
    """Mixed very-short + longer batch must match per-sample decode."""
    rng = np.random.default_rng(3)
    wavs = [(0.1 * rng.standard_normal(n)).astype(np.float32)
            for n in (800, 16000, 3200)]
    batched = [t for t, _ in tiny_ctc_model._decode_batch(wavs, False)]
    single = [tiny_ctc_model._decode_batch([w], False)[0][0] for w in wavs]
    assert batched == single


def test_load_wav_bytes_matches_load_audio(tmp_path):
    """In-memory decode (the HTTP server path) must equal file decode,
    including the resample branch."""
    from gigaam_tpu.audio import load_wav_bytes

    rng = np.random.default_rng(3)
    for sr in (SR, 8000):
        wav = (0.3 * rng.standard_normal(sr)).astype(np.float32)
        path = tmp_path / f"w{sr}.wav"
        _write_wav(path, wav, sr)
        from_file = load_audio(str(path))
        from_bytes = load_wav_bytes(path.read_bytes())
        np.testing.assert_array_equal(from_file, from_bytes)
