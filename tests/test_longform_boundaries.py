"""Longform segmentation boundary invariants, for BOTH VAD backends.

Mirrors the reference's boundary-validation rules
(``tests/test_longform.py:97-123``): every chunk is 0.2–30 s, start < end,
monotonically ordered, and the last chunk never exceeds the audio duration.
Running the same invariants against the energy VAD *and* the neural VAD
regression-guards the VAD swap before real pyannote weights land (the
reference always segments with pyannote, ``gigaam/vad_utils.py:60-77``).
"""

import numpy as np
import pytest

import jax

from gigaam_tpu.vad import energy_speech_regions, segment_audio_file

SR = 16000


def synth_speech(duration: float, seed: int = 0,
                 include_silence: bool = True) -> np.ndarray:
    """Speech-like multi-tone bursts separated by silences (reference
    ``tests/test_longform.py:68-97`` analogue, deterministic)."""
    rng = np.random.default_rng(seed)
    audio = np.zeros(int(SR * duration), dtype=np.float32)
    t_cur = 0.0
    i = 0
    while True:
        seg_dur = float(rng.uniform(0.2, 5.0))
        if t_cur + seg_dur > duration:
            break
        n = int(SR * seg_dur)
        t = np.arange(n) / SR
        seg = (0.4 * np.sin(2 * np.pi * (100 + i * 20) * t)
               + 0.3 * np.sin(2 * np.pi * (200 + i * 30) * t)
               + 0.2 * np.sin(2 * np.pi * (300 + i * 40) * t)
               + 0.02 * rng.standard_normal(n))
        ramp = max(1, int(0.05 * n))
        env = np.ones(n)
        env[:ramp] = np.linspace(0, 1, ramp)
        env[-ramp:] = np.linspace(1, 0, ramp)
        start = int(t_cur * SR)
        audio[start:start + n] = (seg * env).astype(np.float32)
        t_cur += seg_dur + (float(rng.uniform(0.1, 0.5))
                            if include_silence else 0.0)
        i += 1
    return audio


def validate_boundaries(bounds, audio_duration: float):
    """The reference's validation rules, verbatim semantics."""
    issues = []
    for i, (start, end) in enumerate(bounds):
        d = end - start
        if d < 0.2:
            issues.append(f"segment {i} too short: {d:.3f}s")
        if d > 30.0:
            issues.append(f"segment {i} too long: {d:.3f}s")
        if start >= end:
            issues.append(f"segment {i} invalid: {start:.2f}-{end:.2f}")
    for (s0, e0), (s1, e1) in zip(bounds, bounds[1:]):
        if s1 < e0:
            issues.append(f"overlap: {e0:.2f} > {s1:.2f}")
    if bounds and bounds[-1][1] > audio_duration + 1e-6:
        issues.append(f"last segment exceeds audio: {bounds[-1][1]:.2f}")
    return issues


def _neural_fn():
    from gigaam_tpu.models.vad_net import (VADNetConfig, init_vad_params,
                                           make_speech_regions_fn)

    cfg = VADNetConfig(
        sinc_filters=8, sinc_kernel=31, sinc_stride=10,
        conv_channels=6, conv_kernel=5, n_conv_blocks=2, pool=3,
        lstm_hidden=8, lstm_layers=1, linear_hidden=8, linear_layers=1,
        n_classes=7, window_s=0.5, step_s=0.25)
    return make_speech_regions_fn(
        init_vad_params(jax.random.PRNGKey(1), cfg), cfg)


@pytest.mark.parametrize("duration", [30.0, 60.0, 120.0])
def test_energy_vad_boundaries(duration):
    audio = synth_speech(duration)
    segs, bounds = segment_audio_file(audio, SR)
    assert len(segs) == len(bounds)
    issues = validate_boundaries(bounds, duration)
    assert not issues, issues
    # segment waveforms correspond to their boundaries
    for seg, (s, e) in zip(segs, bounds):
        assert len(seg) == int(e * SR) - int(s * SR)


@pytest.mark.parametrize("duration", [30.0, 60.0])
def test_neural_vad_boundaries(duration):
    """The same invariants must hold through the neural-VAD path — whatever
    regions the net emits, the chunk-merge policy enforces the contract."""
    audio = synth_speech(duration, seed=7)
    segs, bounds = segment_audio_file(audio, SR,
                                      speech_regions_fn=_neural_fn())
    assert len(segs) == len(bounds)
    issues = validate_boundaries(bounds, duration)
    assert not issues, issues


def test_energy_vad_handles_edge_inputs():
    # pure silence -> no chunks; tiny 0.5 s clip (reference
    # tests/test_longform.py:208-225) -> at most one valid chunk
    segs, bounds = segment_audio_file(np.zeros(SR * 5, np.float32), SR)
    assert bounds == []
    short = synth_speech(0.5, include_silence=False)
    segs, bounds = segment_audio_file(short, SR)
    assert not validate_boundaries(bounds, 0.5)


def test_energy_regions_on_bursts_are_sane():
    """Region detection itself (pre-merge) finds the bursts, not the gaps."""
    audio = np.zeros(SR * 10, dtype=np.float32)
    t = np.arange(SR * 2) / SR
    burst = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    audio[SR * 1: SR * 3] = burst
    audio[SR * 6: SR * 8] = burst
    regions = energy_speech_regions(audio, SR)
    assert len(regions) == 2
    # onset should be tight; offset may trail by up to the 300 ms hangover
    for (s, e), (gs, ge) in zip(regions, [(1.0, 3.0), (6.0, 8.0)]):
        assert abs(s - gs) < 0.2 and -0.1 < (e - ge) < 0.45
