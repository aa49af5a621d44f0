"""tools/ scripts that previously had no coverage (VERDICT r1 weak #7)."""

import importlib.util
import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "tools", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _FakeHFDataset:
    """Duck-typed stand-in for a datasets.Dataset split (audio pre-cast)."""

    def __init__(self, rows):
        self.rows = rows

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, i):
        return self.rows[i]


def test_export_hf_dataset_writes_wavs_and_manifest(tmp_path):
    """The exporter writes 16 kHz WAVs + a relative-path TSV manifest that
    AudioDataset accepts end to end (reference ToneBooks exporter,
    train_utils/utils.py:80-113)."""
    from gigaam_tpu.config import SAMPLE_RATE
    from gigaam_tpu.data import AudioDataset

    tool = _load_tool("export_hf_dataset")
    rng = np.random.default_rng(0)
    rows = [
        {"audio": {"array": 0.1 * rng.standard_normal(SAMPLE_RATE // 2)},
         "text": f"пример {i}"}
        for i in range(5)
    ]
    out = str(tmp_path / "exported")
    manifest = tool.export_dataset(_FakeHFDataset(rows), out, workers=2)

    assert os.path.isfile(manifest)
    ds = AudioDataset(manifest)
    assert len(ds.samples) == 5
    assert ds.samples[0].text == "пример 0"
    assert abs(ds.samples[0].duration - 0.5) < 1e-3
    # relocatable: paths resolve relative to the manifest after a move
    import shutil
    moved = str(tmp_path / "moved")
    shutil.move(out, moved)
    ds2 = AudioDataset(os.path.join(moved, "manifest.tsv"))
    wav = ds2.load_wav(2)
    assert wav.shape == (SAMPLE_RATE // 2,)

    # limit caps the export
    out2 = str(tmp_path / "limited")
    tool.export_dataset(_FakeHFDataset(rows), out2, limit=2)
    assert len(AudioDataset(os.path.join(out2, "manifest.tsv")).samples) == 2
