"""Cross-check: our golden expectations == the reference's own test files.

``tests/test_golden.py`` pins transcripts / timestamps / emo probs /
longform segments that were transcribed BY HAND from the reference tests —
a single typo in 26 word-timestamp tuples would fail connected-run parity
for the wrong reason (round-3 verdict #7).  This suite parses the literal
``_predictions`` dicts straight out of the reference test sources with
``ast`` (no import, no torch) and diffs them against our constants, so
transcription drift fails loudly *offline*.

Skips only when the reference checkout is absent (e.g. a user running the
public repo without ``/root/reference`` or ``GIGAAM_REFERENCE_ROOT``).
``tools/run_parity.py`` runs this file before the golden suite.
"""

import ast
import os

import pytest

REF_ROOT = os.environ.get("GIGAAM_REFERENCE_ROOT", "/root/reference")
REF_TESTS = os.path.join(REF_ROOT, "tests")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_TESTS),
    reason="reference checkout not available")


def _predictions_of(filename: str) -> dict:
    """Extract the module-level ``_predictions = {...}`` literal."""
    path = os.path.join(REF_TESTS, filename)
    with open(path, encoding="utf-8") as f:
        tree = ast.parse(f.read(), filename=path)
    for node in tree.body:
        if (isinstance(node, ast.Assign) and len(node.targets) == 1
                and isinstance(node.targets[0], ast.Name)
                and node.targets[0].id == "_predictions"):
            return ast.literal_eval(node.value)
    raise AssertionError(f"no _predictions literal in {path}")


def test_asr_and_e2e_texts_match_reference_sources():
    import test_golden as g

    ref = _predictions_of("test_loading.py")
    assert g.ASR_TEXT == ref["asr"]
    assert g.E2E_TEXT["v3_e2e_ctc"] == ref["v3_e2e_ctc"]
    assert g.E2E_TEXT["v3_e2e_rnnt"] == ref["v3_e2e_rnnt"]


def test_emo_probs_match_reference_sources():
    import test_golden as g

    ref = _predictions_of("test_loading.py")["emo"]
    assert set(g.EMO_PROBS) == set(ref)
    for k in ref:
        assert g.EMO_PROBS[k] == ref[k], k


def test_word_timestamps_match_reference_sources():
    import test_golden as g

    ref = _predictions_of("test_timestamps.py")
    for model, ours in (("v3_ctc", g.WORDS_V3_CTC),
                        ("v3_e2e_rnnt", g.WORDS_V3_E2E_RNNT)):
        want = [(w["word"], w["start"], w["end"])
                for w in ref[model]["words"]]
        assert ours == want, f"{model}: word timestamp drift vs reference"
        # the per-model full text must also agree with the loading-test text
        assert ref[model]["text"] == (
            g.ASR_TEXT if model == "v3_ctc" else g.E2E_TEXT[model])


def test_longform_segments_match_reference_sources():
    import test_golden as g

    ref = _predictions_of("test_longform.py")
    assert set(g.LONGFORM) == set(ref)
    for model, segs in ref.items():
        want = [(s["transcription"], *s["boundaries"]) for s in segs]
        assert g.LONGFORM[model] == want, (
            f"{model}: longform golden drift vs reference")
