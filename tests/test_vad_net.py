"""Neural VAD (PyanNet-style) tests.

Numerics are pinned against a from-scratch torch re-implementation of the
pyannote PyanNet forward (``gigaam/vad_utils.py:41-77`` loads the real one);
weights travel through ``convert_pyannote_vad`` using pyannote's state_dict
naming, so the converter's layout mapping is exercised end to end.
"""

import numpy as np
import pytest

import jax

from gigaam_tpu.checkpoint import _sinc_taps_fallback, convert_pyannote_vad
from gigaam_tpu.models.vad_net import (
    VADNetConfig,
    frame_logits,
    init_vad_params,
    make_speech_regions_fn,
    sliding_class_probs,
    speech_regions,
)

torch = pytest.importorskip("torch")

SR = 16000

# small-but-structurally-faithful net for the torch cross-check
TINY = VADNetConfig(
    sinc_filters=8, sinc_kernel=31, sinc_stride=10,
    conv_channels=6, conv_kernel=5, n_conv_blocks=2, pool=3,
    lstm_hidden=8, lstm_layers=2, linear_hidden=8, linear_layers=2,
    n_classes=7, window_s=0.5, step_s=0.25)


def _torch_state_dict(cfg: VADNetConfig, seed: int = 0):
    """Random weights under pyannote's state_dict names."""
    g = torch.Generator().manual_seed(seed)

    def r(*shape, scale=0.3):
        return torch.randn(*shape, generator=g) * scale

    sd = {
        "sincnet.wav_norm1d.weight": r(1) + 1.0,
        "sincnet.wav_norm1d.bias": r(1),
        "sincnet.conv1d.0.filterbank.low_hz_": r(cfg.sinc_filters // 2, 1,
                                                 scale=200.0).abs() + 30.0,
        "sincnet.conv1d.0.filterbank.band_hz_": r(cfg.sinc_filters // 2, 1,
                                                  scale=200.0).abs() + 30.0,
    }
    c = cfg.conv_channels
    for i in range(cfg.n_conv_blocks):
        cin = cfg.sinc_filters if i == 0 else c
        sd[f"sincnet.conv1d.{i + 1}.weight"] = r(c, cin, cfg.conv_kernel)
        sd[f"sincnet.conv1d.{i + 1}.bias"] = r(c)
    for i in range(cfg.n_conv_blocks + 1):
        ch = cfg.sinc_filters if i == 0 else c
        sd[f"sincnet.norm1d.{i}.weight"] = r(ch) + 1.0
        sd[f"sincnet.norm1d.{i}.bias"] = r(ch)
    h = cfg.lstm_hidden
    for li in range(cfg.lstm_layers):
        d_in = c if li == 0 else 2 * h
        for suf in ("", "_reverse"):
            sd[f"lstm.weight_ih_l{li}{suf}"] = r(4 * h, d_in)
            sd[f"lstm.weight_hh_l{li}{suf}"] = r(4 * h, h)
            sd[f"lstm.bias_ih_l{li}{suf}"] = r(4 * h)
            sd[f"lstm.bias_hh_l{li}{suf}"] = r(4 * h)
    d = 2 * h
    for i in range(cfg.linear_layers):
        sd[f"linear.{i}.weight"] = r(cfg.linear_hidden, d)
        sd[f"linear.{i}.bias"] = r(cfg.linear_hidden)
        d = cfg.linear_hidden
    sd["classifier.weight"] = r(cfg.n_classes, d)
    sd["classifier.bias"] = r(cfg.n_classes)
    return sd


def _torch_pyannet_forward(sd, cfg: VADNetConfig, wav: np.ndarray,
                           taps: np.ndarray):
    """PyanNet forward in plain torch ops (sinc stage = given FIR taps)."""
    import torch.nn.functional as F

    x = torch.from_numpy(wav)[None, None, :]  # [1, 1, T]
    x = F.instance_norm(
        x, weight=sd["sincnet.wav_norm1d.weight"],
        bias=sd["sincnet.wav_norm1d.bias"], use_input_stats=True)
    x = F.conv1d(x, torch.from_numpy(taps)[:, None, :],
                 stride=cfg.sinc_stride)
    x = torch.abs(x)
    for i in range(cfg.n_conv_blocks + 1):
        if i > 0:
            x = F.conv1d(x, sd[f"sincnet.conv1d.{i}.weight"],
                         sd[f"sincnet.conv1d.{i}.bias"])
        x = F.max_pool1d(x, cfg.pool)
        x = F.instance_norm(
            x, weight=sd[f"sincnet.norm1d.{i}.weight"],
            bias=sd[f"sincnet.norm1d.{i}.bias"], use_input_stats=True)
        x = F.leaky_relu(x)
    x = x.transpose(1, 2)  # [1, T, C]
    lstm = torch.nn.LSTM(cfg.conv_channels, cfg.lstm_hidden,
                         num_layers=cfg.lstm_layers, batch_first=True,
                         bidirectional=True)
    lstm_sd = {k[len("lstm."):]: v for k, v in sd.items()
               if k.startswith("lstm.")}
    lstm.load_state_dict(lstm_sd)
    with torch.no_grad():
        x, _ = lstm(x)
        for i in range(cfg.linear_layers):
            x = F.leaky_relu(F.linear(x, sd[f"linear.{i}.weight"],
                                      sd[f"linear.{i}.bias"]))
        x = F.linear(x, sd["classifier.weight"], sd["classifier.bias"])
        return F.log_softmax(x, dim=-1).numpy()


def test_frame_logits_matches_torch_pyannet(tmp_path):
    sd = _torch_state_dict(TINY)
    ckpt = tmp_path / "pyannote_vad.bin"
    torch.save({"state_dict": sd}, ckpt)

    cfg, params = convert_pyannote_vad(str(ckpt), kernel_size=TINY.sinc_kernel)
    assert cfg.sinc_filters == TINY.sinc_filters
    assert cfg.lstm_layers == TINY.lstm_layers
    assert cfg.n_conv_blocks == TINY.n_conv_blocks

    rng = np.random.default_rng(0)
    wav = (0.1 * rng.standard_normal(SR // 2)).astype(np.float32)

    taps = np.asarray(params["sinc"]["taps"])[:, 0, :].T  # [F, K]
    ref = _torch_pyannet_forward(sd, TINY, wav, taps)
    ours = np.asarray(frame_logits(params, wav[None, :], cfg))

    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_sinc_taps_properties():
    low = np.array([200.0, 1000.0, 3000.0])
    band = np.array([100.0, 300.0, 500.0])
    taps = _sinc_taps_fallback(low, band, kernel_size=251)
    assert taps.shape == (6, 251)
    # sine (Hilbert-pair) filters are antisymmetric -> exactly zero DC gain
    np.testing.assert_allclose(taps[3:].sum(axis=1), 0.0, atol=1e-5)
    # band-pass: response peaks inside the band, DC well below the peak
    freqs = np.fft.rfftfreq(2048, 1 / SR)
    resp = np.abs(np.fft.rfft(taps[:3], n=2048, axis=1))
    peak_f = freqs[resp.argmax(axis=1)]
    lo = 50.0 + np.abs(low)
    hi = lo + 50.0 + np.abs(band)
    assert np.all(peak_f >= lo * 0.5) and np.all(peak_f <= hi * 1.5)
    assert np.all(resp[:, 0] < 0.2 * resp.max(axis=1))


def test_receptive_field_matches_frame_count():
    cfg = VADNetConfig()
    rf_k, rf_s = cfg.receptive_field()
    assert (rf_k, rf_s) == (991, 270)  # seg-3.0 geometry: ~59.3 fps
    params = init_vad_params(jax.random.PRNGKey(0), TINY)
    for n in (SR // 2, SR // 2 + 137):
        out = frame_logits(params, np.zeros((1, n), np.float32), TINY)
        assert out.shape[1] == TINY.num_frames(n)


def test_sliding_matches_direct_on_single_window():
    params = init_vad_params(jax.random.PRNGKey(1), TINY)
    rng = np.random.default_rng(1)
    wav = (0.1 * rng.standard_normal(int(TINY.window_s * SR))).astype(
        np.float32)
    probs, times = sliding_class_probs(params, TINY, wav)
    direct = np.exp(np.asarray(frame_logits(params, wav[None, :], TINY)))[0]
    np.testing.assert_allclose(probs, direct, atol=1e-5)
    rf_k, rf_s = TINY.receptive_field()
    np.testing.assert_allclose(times[0], rf_k / 2 / SR, atol=1e-6)
    np.testing.assert_allclose(np.diff(times), rf_s / SR, atol=1e-6)


def test_sliding_overlap_average_long_wav():
    params = init_vad_params(jax.random.PRNGKey(2), TINY)
    rng = np.random.default_rng(2)
    wav = (0.1 * rng.standard_normal(3 * SR)).astype(np.float32)
    probs, times = sliding_class_probs(params, TINY, wav)
    assert probs.shape[1] == TINY.n_classes
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-4)
    assert times[-1] >= 3.0 - 2 * TINY.window_s


def test_speech_regions_and_segmenter_integration(tmp_path):
    """Regions come out ordered/clipped, and plug into segment_audio_file."""
    import wave

    from gigaam_tpu.vad import segment_audio_file

    params = init_vad_params(jax.random.PRNGKey(3), TINY)
    rng = np.random.default_rng(3)
    wav = (0.1 * rng.standard_normal(2 * SR)).astype(np.float32)

    regions = speech_regions(params, TINY, wav)
    for s, e in regions:
        assert 0.0 <= s < e <= 2.0 + 1e-6
    assert regions == sorted(regions)

    path = tmp_path / "x.wav"
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes((wav * 32767).astype(np.int16).tobytes())
    segs, bounds = segment_audio_file(
        str(path), speech_regions_fn=make_speech_regions_fn(params, TINY))
    assert len(segs) == len(bounds)
    for seg, (s, e) in zip(segs, bounds):
        assert abs(len(seg) / SR - (e - s)) < 0.01


def test_min_duration_post_processing():
    params = init_vad_params(jax.random.PRNGKey(4), TINY)
    rng = np.random.default_rng(4)
    wav = (0.1 * rng.standard_normal(SR)).astype(np.float32)
    base = speech_regions(params, TINY, wav)
    merged = speech_regions(params, TINY, wav, min_duration_off=10.0)
    if base:
        assert len(merged) == 1
        assert merged[0][0] == base[0][0] and merged[0][1] == base[-1][1]
    filt = speech_regions(params, TINY, wav, min_duration_on=10.0)
    assert filt == []


def test_sinc_taps_match_published_sincnet_formula():
    """Pin `_sinc_taps_fallback` against an independent reconstruction of
    the published SincNet/ParamSincFB filter equations (Ravanelli & Bengio
    2018; asteroid-filterbanks ParamSincFB — what pyannote's sincnet stage
    materializes at runtime): ideal band-pass / Hilbert-pair impulse
    responses, SincNet's half-Hamming window, 1/(2*band) normalization."""
    sr, K = 16000, 251
    rng = np.random.default_rng(3)
    low_hz_ = rng.uniform(-300, 300, (5, 1))
    band_hz_ = rng.uniform(-400, 400, (5, 1))

    got = _sinc_taps_fallback(low_hz_, band_hz_, K, sr)

    # independent reconstruction, full-kernel (not concat-of-halves)
    min_low, min_band = 50.0, 50.0
    f_lo = min_low + np.abs(low_hz_[:, 0])
    f_hi = np.clip(f_lo + min_band + np.abs(band_hz_[:, 0]), min_low, sr / 2)
    half = K // 2
    n = np.arange(-half, half + 1)                     # sample offsets
    t = n / sr                                         # seconds
    # SincNet's window: Hamming over a linspace of period K (left half,
    # mirrored) — published code detail, not an integer-indexed np.hamming
    n_lin = np.linspace(0, K / 2 - 1, num=half)
    w_half = 0.54 - 0.46 * np.cos(2 * np.pi * n_lin / K)
    w = np.concatenate([w_half, [1.0], w_half[::-1]])

    exp = np.zeros((2 * len(f_lo), K))
    for i, (fl, fh) in enumerate(zip(f_lo, f_hi)):
        with np.errstate(divide="ignore", invalid="ignore"):
            cos_f = (np.sin(2 * np.pi * fh * t)
                     - np.sin(2 * np.pi * fl * t)) / (np.pi * t)
            sin_f = (np.cos(2 * np.pi * fl * t)
                     - np.cos(2 * np.pi * fh * t)) / (np.pi * t)
        cos_f[half] = 2 * (fh - fl)                    # sinc limit at t=0
        sin_f[half] = 0.0                              # odd symmetry
        norm = 2 * (fh - fl)
        exp[i] = cos_f * w / norm
        exp[i + len(f_lo)] = sin_f * w / norm

    np.testing.assert_allclose(got, exp, atol=1e-6, rtol=1e-5)


def test_neural_vad_autodiscovery(tmp_path, monkeypatch):
    """A converted VAD artifact at GIGAAM_VAD_ARTIFACT (or the cache
    default) becomes the longform segmentation default automatically;
    'energy' forces the energy VAD (reference parity: longform always runs
    the pyannote net, gigaam/vad_utils.py:60-77)."""
    from gigaam_tpu import vad
    from gigaam_tpu.models.vad_net import save_vad

    params = init_vad_params(jax.random.PRNGKey(0), TINY)
    art = str(tmp_path / "vad_segmentation")
    save_vad(art, TINY, params)

    monkeypatch.setattr(vad, "_NEURAL_VAD", None)
    monkeypatch.setenv("GIGAAM_VAD_ARTIFACT", art + ".npz")
    fn = vad._discover_neural_vad()
    assert fn is not None
    # the discovered closure is the artifact's own regions fn
    wav = (0.05 * np.random.default_rng(0)
           .standard_normal(SR)).astype(np.float32)
    direct_fn = make_speech_regions_fn(params, TINY)
    assert fn(wav) == direct_fn(wav)
    # second call returns the cached closure without reloading
    assert vad._discover_neural_vad() is fn

    # segment_audio_file picks it up as the default detector
    segs, bounds = vad.segment_audio_file(wav)
    assert [tuple(b) for b in bounds] == \
        [tuple(b) for b in vad.merge_regions_into_chunks(direct_fn(wav), 1.0)]

    # explicit opt-out
    monkeypatch.setenv("GIGAAM_VAD_ARTIFACT", "energy")
    assert vad._discover_neural_vad() is None

    # no env, nothing in the cache dir -> None
    monkeypatch.delenv("GIGAAM_VAD_ARTIFACT")
    monkeypatch.setattr(vad, "_NEURAL_VAD", None)
    import gigaam_tpu
    monkeypatch.setattr(gigaam_tpu, "_CACHE_DIR", str(tmp_path / "empty"))
    assert vad._discover_neural_vad() is None
    # ... and IS found when the artifact sits at the cache default path
    monkeypatch.setattr(gigaam_tpu, "_CACHE_DIR", str(tmp_path))
    assert vad._discover_neural_vad() is not None


def test_corrupt_vad_artifact_falls_back_to_energy(tmp_path, monkeypatch):
    """A half-written artifact (npz without its json sidecar) must degrade
    to the energy VAD with a warning, not break transcribe_longform."""
    import warnings

    from gigaam_tpu import vad

    bad = tmp_path / "vad_segmentation.npz"
    bad.write_bytes(b"not an npz")
    monkeypatch.setattr(vad, "_NEURAL_VAD", None)
    monkeypatch.setenv("GIGAAM_VAD_ARTIFACT", str(bad))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert vad._discover_neural_vad() is None
        assert any("unusable VAD artifact" in str(x.message) for x in w)
    # failure is cached: a second call stays silent and still falls back
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert vad._discover_neural_vad() is None
        assert not w
    # end to end: segmentation still works via the energy detector
    wav = np.zeros(SR * 2, dtype=np.float32)
    t = np.arange(SR) / SR
    wav[SR // 2: SR // 2 + SR] = (0.4 * np.sin(2 * np.pi * 440 * t))
    segs, bounds = vad.segment_audio_file(wav)
    assert len(bounds) == 1


def test_sliding_chunked_megabatches_long_wav():
    """>64 windows crosses the bounded mega-batch boundary; results must be
    identical to any other batching (per-window net + overlap average)."""
    params = init_vad_params(jax.random.PRNGKey(4), TINY)
    rng = np.random.default_rng(4)
    wav = (0.1 * rng.standard_normal(18 * SR)).astype(np.float32)
    n_windows = len(range(0, len(wav) - int(TINY.window_s * SR) + 1,
                          int(TINY.step_s * SR)))
    assert n_windows > 64  # crosses at least one chunk boundary
    probs, times = sliding_class_probs(params, TINY, wav)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-4)
    assert (np.diff(times) > 0).all()
    # prefix invariance: frames whose covering windows lie fully inside a
    # 6 s prefix see identical inputs, so chunking cannot change them
    p6, t6 = sliding_class_probs(params, TINY, wav[: 6 * SR])
    k = int(np.searchsorted(t6, 6.0 - 2 * TINY.window_s))
    assert k > 0
    np.testing.assert_allclose(probs[:k], p6[:k], atol=1e-5)
