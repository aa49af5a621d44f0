"""Voice-activity segmentation for longform transcription.

The reference depends on the pyannote ``segmentation-3.0`` torch model (HF
token gated, ``gigaam/vad_utils.py:60-77``).  We keep its *chunking policy*
(greedy merge of speech regions into 15-22 s chunks, hard split above 30 s,
drop below 0.2 s — ``vad_utils.py:104-136``) but make the speech detector
pluggable, with a dependency-free energy VAD as the default:

* frame RMS energy in dB over 30 ms windows / 10 ms hop,
* adaptive threshold between the noise floor and the speech level,
* hangover smoothing to bridge short intra-speech gaps.

A neural JAX VAD can be slotted in by passing ``speech_regions_fn``, or —
matching the reference pipeline, where longform always runs the pyannote
segmentation net — by converting the pyannote checkpoint once
(``tools/convert_vad.py``) and dropping the artifact where
``_discover_neural_vad`` finds it (``$GIGAAM_VAD_ARTIFACT`` or
``~/.cache/gigaam_tpu/vad_segmentation.npz``); it then becomes the default
detector automatically.
"""

from __future__ import annotations

import os
from typing import Callable, List, Optional, Tuple, Union

import numpy as np

from .audio import load_audio
from .config import SAMPLE_RATE

Region = Tuple[float, float]

# loaded-artifact cache, keyed by path (the reference similarly caches the
# pyannote pipeline in a module global, ``gigaam/vad_utils.py:37,60-66``)
_NEURAL_VAD: Optional[Tuple[str, Callable]] = None


def _discover_neural_vad() -> Optional[Callable[[np.ndarray], List[Region]]]:
    """Return the converted neural-VAD detector if an artifact is available.

    Resolution order: ``GIGAAM_VAD_ARTIFACT`` env var (set to ``energy`` /
    ``off`` / ``0`` to force the energy VAD), then
    ``<cache>/vad_segmentation.npz`` — the default output of
    ``tools/convert_vad.py``.  Returns None when nothing is found.
    """
    global _NEURAL_VAD
    path = os.environ.get("GIGAAM_VAD_ARTIFACT")
    if path and path.lower() in ("0", "off", "energy", "none"):
        return None
    if not path:
        from . import _CACHE_DIR

        path = os.path.join(_CACHE_DIR, "vad_segmentation.npz")
    if not os.path.isfile(path) and not os.path.isfile(path + ".npz"):
        return None
    if _NEURAL_VAD is not None and _NEURAL_VAD[0] == path:
        return _NEURAL_VAD[1]
    try:
        from .models.vad_net import load_vad_regions_fn

        fn = load_vad_regions_fn(path)
    except Exception as e:
        # a half-written or corrupt artifact in the cache (e.g. an
        # interrupted convert_vad.py) must degrade to the energy VAD,
        # not break every transcribe_longform
        import warnings

        warnings.warn(f"ignoring unusable VAD artifact {path!r}: {e}; "
                      f"falling back to the energy VAD")
        fn = None
    _NEURAL_VAD = (path, fn)  # cache failures too: warn once, not per call
    return fn


def energy_speech_regions(
    wav: np.ndarray,
    sr: int = SAMPLE_RATE,
    frame_ms: float = 30.0,
    hop_ms: float = 10.0,
    threshold_db: float = 9.0,
    hangover_ms: float = 300.0,
    min_speech_ms: float = 90.0,
) -> List[Region]:
    """Energy-based VAD: returns merged (start, end) speech regions in sec."""
    frame = int(sr * frame_ms / 1000)
    hop = int(sr * hop_ms / 1000)
    # absolute silence gate: an adaptive threshold on digital silence would
    # otherwise degenerate to "everything is speech" (-55 dBFS is far below
    # any real speech on normalized float audio)
    SILENCE_DBFS = -55.0
    if len(wav) < frame:
        if not len(wav):
            return []
        level = 20.0 * np.log10(
            float(np.sqrt(np.mean(np.square(wav, dtype=np.float64)))) + 1e-12)
        return [] if level < SILENCE_DBFS else [(0.0, len(wav) / sr)]

    n = (len(wav) - frame) // hop + 1
    # frame energies via a cumulative sum over wav^2 — O(N), no [n, frame]
    # gather (the materialized-frames version cost ~1.4 s for 10 min of
    # audio and dominated longform wall time)
    cs = np.concatenate(([0.0], np.cumsum(np.square(wav, dtype=np.float64))))
    starts = np.arange(n) * hop
    rms = np.sqrt((cs[starts + frame] - cs[starts]) / frame + 1e-12)
    db = 20.0 * np.log10(rms + 1e-12)

    floor = np.percentile(db, 10)
    ceil = np.percentile(db, 95)
    if ceil < SILENCE_DBFS:  # noise floor only: no speech anywhere
        return []
    if ceil - floor < 3.0:   # roughly stationary signal: treat all as speech
        return [(0.0, len(wav) / sr)]
    thresh = min(floor + threshold_db, ceil - 3.0)
    speech = db > thresh

    # hangover smoothing: keep speech on for hangover frames after activity
    # (vectorized: frame i is on iff some speech frame lies within the last
    # ``hang`` frames — distance to the most recent speech frame < hang)
    hang = max(1, int(hangover_ms / hop_ms))
    last = np.maximum.accumulate(np.where(speech, np.arange(n), -1))
    smoothed = (last >= 0) & (np.arange(n) - last < hang)

    # region extraction from on/off transitions; the last active frame is
    # off-1, covering samples up to (off-1)*hop + frame
    padded = np.concatenate(([False], smoothed, [False]))
    edges = np.flatnonzero(np.diff(padded.astype(np.int8)))
    regions: List[Region] = []
    for on, off in zip(edges[0::2], edges[1::2]):
        if off >= n:  # ran to the end of the signal
            regions.append((on * hop / sr, len(wav) / sr))
        else:
            regions.append((on * hop / sr, ((off - 1) * hop + frame) / sr))

    min_len = min_speech_ms / 1000.0
    return [(s, e) for s, e in regions if e - s >= min_len]


def merge_regions_into_chunks(
    regions: List[Region],
    total_duration: float,
    max_duration: float = 22.0,
    min_duration: float = 15.0,
    strict_limit_duration: float = 30.0,
    new_chunk_threshold: float = 0.2,
) -> List[Region]:
    """Greedy chunk builder with the reference's policy
    (``gigaam/vad_utils.py:104-136``): grow a chunk with successive speech
    regions until it would exceed ``max_duration`` (or already exceeds
    ``min_duration``), split any chunk above ``strict_limit_duration``
    evenly, drop chunks below ``new_chunk_threshold``."""
    chunks: List[Region] = []

    def emit(start: float, end: float) -> None:
        duration = end - start
        if duration > strict_limit_duration:
            parts = int(duration / strict_limit_duration) + 1
            step = duration / parts
            for p in range(parts):
                chunks.append((start + p * step, start + (p + 1) * step))
        else:
            chunks.append((start, end))

    cur_start = cur_end = None
    for start, end in regions:
        start = max(0.0, start)
        end = min(total_duration, end)
        if cur_start is None:
            cur_start, cur_end = start, end
            continue
        cur_duration = cur_end - cur_start
        if cur_duration > new_chunk_threshold and (
            cur_duration + (end - cur_end) > max_duration
            or cur_duration > min_duration
        ):
            emit(cur_start, cur_end)
            cur_start = start
        cur_end = end

    if cur_start is not None and (cur_end - cur_start) > new_chunk_threshold:
        emit(cur_start, cur_end)
    return chunks


def segment_audio_file(
    wav_file: Union[str, np.ndarray],
    sr: int = SAMPLE_RATE,
    max_duration: float = 22.0,
    min_duration: float = 15.0,
    strict_limit_duration: float = 30.0,
    new_chunk_threshold: float = 0.2,
    speech_regions_fn: Optional[Callable[[np.ndarray], List[Region]]] = None,
) -> Tuple[List[np.ndarray], List[Region]]:
    """Segment an audio file (or an in-memory waveform) into ASR-sized
    chunks.

    Returns (wave_segments, (start, end) boundaries), the same contract as
    the reference ``segment_audio_file`` (``gigaam/vad_utils.py:80-136``).
    """
    audio = (wav_file if isinstance(wav_file, np.ndarray)
             else load_audio(wav_file, sr))
    detector = speech_regions_fn
    if detector is None:
        neural = _discover_neural_vad()
        if neural is not None and sr != SAMPLE_RATE:
            # the converted net is trained at 16 kHz: feed it a resampled
            # copy for detection only — region times are in seconds, so the
            # chunk slicing below stays on the caller's rate
            from .audio import resample

            detector = (lambda w: neural(resample(w, sr, SAMPLE_RATE)))
        else:
            detector = neural
    if detector is None:
        detector = (lambda w: energy_speech_regions(w, sr))
    regions = detector(audio)
    chunks = merge_regions_into_chunks(
        regions, len(audio) / sr,
        max_duration=max_duration, min_duration=min_duration,
        strict_limit_duration=strict_limit_duration,
        new_chunk_threshold=new_chunk_threshold)
    segments = [audio[int(s * sr): int(e * sr)] for s, e in chunks]
    return segments, chunks
