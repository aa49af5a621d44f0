"""Token-frame -> word-level timestamps (reference
``gigaam/timestamps_utils.py``). Pure host-side text logic."""

from __future__ import annotations

from typing import List

from ..config import SAMPLE_RATE
from ..types import Word
from .tokenizer import Tokenizer

_WORD_BOUNDARY = "▁"


def compute_frame_shift(audio_length_samples: int, seq_len: int) -> float:
    """Seconds per encoder frame (``timestamps_utils.py:8-10``).

    ``seq_len`` can be 0 for near-empty audio (fewer samples than one
    frontend hop); no tokens exist then either, so any finite shift works.
    """
    if seq_len <= 0:
        return 0.0
    return audio_length_samples / SAMPLE_RATE / seq_len


def frames_to_words(
    tokenizer: Tokenizer,
    token_ids: List[int],
    token_frames: List[int],
    frame_shift: float,
) -> List[Word]:
    """Group tokens into words at '▁' prefixes or spaces; word span =
    [first_frame, last_frame + 1] x shift (``timestamps_utils.py:13-53``)."""
    words: List[Word] = []
    current_chars: List[str] = []
    current_frames: List[int] = []

    def commit() -> None:
        if not current_chars:
            return
        text = "".join(current_chars).strip()
        if not text:
            current_chars.clear()
            current_frames.clear()
            return
        start = current_frames[0] * frame_shift
        end = (current_frames[-1] + 1) * frame_shift
        words.append(Word(text=text, start=start, end=end))
        current_chars.clear()
        current_frames.clear()

    for token_id, frame in zip(token_ids, token_frames):
        char = tokenizer.id_to_str(token_id)
        if not char:  # control/unused piece: decode drops it from the text
            continue
        if char.startswith(_WORD_BOUNDARY):
            commit()
            char = char[1:]
        elif char == " ":
            commit()
            continue
        current_chars.append(char)
        current_frames.append(frame)

    commit()
    return words
