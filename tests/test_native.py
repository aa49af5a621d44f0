"""Native C++ kernel tests: builds _native.so, checks parity with the
pure-Python/scipy fallbacks and with torch/scipy references."""

import numpy as np
import pytest

from gigaam_tpu import native
from gigaam_tpu.audio import resample
from gigaam_tpu.metrics import levenshtein


def test_native_builds():
    assert native.available(), "g++ build of _native.so failed"


def test_s16_to_f32():
    pcm = np.array([0, 1, -1, 32767, -32768], dtype=np.int16)
    out = native.s16_to_f32(pcm)
    np.testing.assert_allclose(
        out, pcm.astype(np.float32) / 32768.0, atol=0)


def test_levenshtein_matches_python():
    rng = np.random.default_rng(0)
    for _ in range(20):
        a = rng.integers(0, 5, rng.integers(0, 12)).tolist()
        b = rng.integers(0, 5, rng.integers(0, 12)).tolist()
        assert native.levenshtein_ids(a, b) == levenshtein(a, b)
    assert native.levenshtein_seqs("кот мяу".split(), "кот гав".split()) == 1
    assert native.levenshtein_seqs([], ["x"]) == 1


def test_resample_matches_scipy():
    from scipy.signal import resample_poly as scipy_resample

    rng = np.random.default_rng(1)
    t = np.arange(44100) / 44100.0
    wav = (0.5 * np.sin(2 * np.pi * 440 * t)
           + 0.1 * rng.standard_normal(len(t))).astype(np.float32)

    ours = resample(wav, 44100, 16000)
    ref = scipy_resample(wav.astype(np.float64), 160, 441).astype(np.float32)
    assert abs(len(ours) - len(ref)) <= 1
    n = min(len(ours), len(ref))
    # interior parity (edge handling differs slightly from scipy's padding)
    sl = slice(1000, n - 1000)
    err = np.abs(ours[sl] - ref[sl]).max()
    assert err < 5e-3, f"resample mismatch: {err}"


def test_resample_preserves_tone():
    sr_in, sr_out, f0 = 8000, 16000, 440.0
    t = np.arange(sr_in) / sr_in
    wav = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    out = resample(wav, sr_in, sr_out)
    assert len(out) == sr_out
    # dominant frequency must stay 440 Hz
    spec = np.abs(np.fft.rfft(out[2000:-2000] * np.hanning(len(out) - 4000)))
    peak_hz = np.argmax(spec) * sr_out / (len(out) - 4000)
    assert abs(peak_hz - f0) < 2.0


def test_s16_interleaved_to_mono_matches_numpy():
    from gigaam_tpu import native

    rng = np.random.default_rng(0)
    pcm = rng.integers(-32768, 32767, 6000, dtype=np.int16)
    for ch in (2, 3):
        got = native.s16_interleaved_to_mono(pcm, ch)
        frames = pcm.size // ch
        ref = (pcm[: frames * ch].reshape(-1, ch).astype(np.float32)
               .mean(axis=1) / 32768.0)
        np.testing.assert_allclose(got, ref, atol=1e-6)


def test_collate_matches_numpy():
    from gigaam_tpu import native

    rng = np.random.default_rng(1)
    rows = [rng.standard_normal(n).astype(np.float32)
            for n in (100, 37, 256, 1)]
    got = native.collate(rows, 256)
    ref = np.zeros((4, 256), np.float32)
    for i, r in enumerate(rows):
        ref[i, : len(r)] = r
    np.testing.assert_array_equal(got, ref)


def test_corrupt_so_rebuilds_once(tmp_path, monkeypatch):
    """A corrupt _native.so (e.g. an old interrupted build) must be rebuilt
    through the temp+rename path, not trusted forever on mtime.  Runs
    against a tmp copy: clobbering the real (dlopen-mapped) file in place
    would corrupt the live mapping."""
    import os
    import time

    so = str(tmp_path / "_native.so")
    with open(so, "wb") as f:
        f.write(b"not an elf file")
    # future mtime: only the CDLL-failure path may trigger the rebuild
    t = time.time() + 1e6
    os.utime(so, (t, t))
    monkeypatch.setattr(native, "_SO", so)
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_load_failed", False)
    assert native._load() is not None, "corrupt .so should trigger a rebuild"
    with open(so, "rb") as f:
        assert f.read(4) != b"not "


def test_failed_build_cached(monkeypatch, tmp_path):
    """When the compiler is unavailable, only ONE build attempt happens per
    process — per-call g++ respawns would turn a WER loop into hours."""
    import subprocess as sp

    calls = []
    orig_run = sp.run

    def counting_run(*a, **kw):
        calls.append(1)
        raise FileNotFoundError("g++ gone")

    monkeypatch.setattr(native.subprocess, "run", counting_run)
    monkeypatch.setattr(native, "_SO", str(tmp_path / "absent.so"))
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_load_failed", False)
    assert native._load() is None
    assert native._load() is None
    assert native._load() is None
    assert len(calls) == 1, calls
