"""Offline coverage of the real-data (HF hub) code paths.

The hub is unreachable in this environment, so these tests exercise the
exact code the networked paths run — create_dataset's filter/subsample/
label-map/split logic, ExpressoSource's per-sample transform,
UrbanSoundHFSource's preprocessing, and push_to_hub's API plumbing —
against in-memory fakes with the HF datasets/huggingface_hub row schema.
A final network-gated smoke (skipped offline) runs the true hub path on
networked machines.
"""

import os
import sys
import types

import numpy as np
import pytest

from audio_transformers_tpu.data.tokenizer import ByteTokenizer


class FakeHFDataset:
    """Duck-type of datasets.Dataset for the columns our pipelines use."""

    def __init__(self, rows):
        self.rows = rows

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, key):
        if isinstance(key, str):  # column access
            return [r[key] for r in self.rows]
        return self.rows[int(key)]


def _expresso_rows(n=40, sr=8000, seed=0):
    rng = np.random.default_rng(seed)
    styles = ["happy", "sad", "longform", "default"]
    rows = []
    for i in range(n):
        rows.append({
            "audio": {"array": rng.standard_normal(sr).astype(np.float64),
                      "sampling_rate": sr},
            "text": f"utterance number {i}",
            "style": styles[i % len(styles)],
        })
    return rows


class TestCreateDatasetLogic:
    def _patched(self, monkeypatch, rows):
        fake_mod = types.SimpleNamespace(
            load_dataset=lambda *a, **k: FakeHFDataset(rows))
        monkeypatch.setitem(sys.modules, "datasets", fake_mod)

    def test_longform_filtered_and_label_map_sorted(self, monkeypatch):
        from audio_transformers_tpu.data.expresso import create_dataset

        self._patched(monkeypatch, _expresso_rows())
        tr, va, te, style_to_idx = create_dataset(ByteTokenizer())
        # longform excluded entirely; map sorted alphabetically
        assert "longform" not in style_to_idx
        assert list(style_to_idx) == sorted(style_to_idx)
        assert tr.num_samples + va.num_samples + te.num_samples == 30
        # every split sees every style (stratified guarantee)
        for src in (tr, va, te):
            seen = {src.ds[i]["style"] for i in src.indices}
            assert seen == set(style_to_idx)

    def test_data_percentage_seeded(self, monkeypatch):
        from audio_transformers_tpu.data.expresso import create_dataset

        self._patched(monkeypatch, _expresso_rows())
        a = create_dataset(ByteTokenizer(), data_percentage=0.5, seed=7)
        b = create_dataset(ByteTokenizer(), data_percentage=0.5, seed=7)
        assert a[0].indices == b[0].indices  # reproducible subsample
        total = sum(s.num_samples for s in a[:3])
        assert total == 15  # 50% of the 30 non-longform rows

    def test_selected_styles(self, monkeypatch):
        from audio_transformers_tpu.data.expresso import create_dataset

        self._patched(monkeypatch, _expresso_rows())
        _, _, _, style_to_idx = create_dataset(
            ByteTokenizer(), selected_styles=["happy", "sad"])
        assert set(style_to_idx) == {"happy", "sad"}

    def test_source_sample_schema(self, monkeypatch):
        """ExpressoSource resamples, pads to 30 s, tokenizes with pad."""
        from audio_transformers_tpu.data.expresso import create_dataset

        self._patched(monkeypatch, _expresso_rows())
        tr, _, _, style_to_idx = create_dataset(ByteTokenizer(),
                                                max_label_len=64)
        s = tr(0)
        assert s["waveform"].shape == (16000 * 30,)
        assert s["waveform"].dtype == np.float32
        assert s["labels"].shape == (64,)
        assert s["label_len"] > 0
        tok = ByteTokenizer()
        assert (s["labels"][s["label_len"]:] == tok.pad_token_id).all()
        assert 0 <= s["emotion_labels"] < len(style_to_idx)


class TestUrbanSoundHFSource:
    def test_hf_source_preprocessing(self, monkeypatch):
        rng = np.random.default_rng(0)
        rows = [{"audio": {"array":
                           rng.standard_normal((2, 8000)).astype(np.float64),
                           "sampling_rate": 8000},
                 "classID": i % 10} for i in range(6)]
        fake_mod = types.SimpleNamespace(
            load_dataset=lambda *a, **k: FakeHFDataset(rows))
        monkeypatch.setitem(sys.modules, "datasets", fake_mod)

        from audio_transformers_tpu.data.urbansound import UrbanSoundHFSource

        src = UrbanSoundHFSource(limit_samples=4)
        assert src.num_samples == 4
        s = src(1)
        # stereo -> mono, resampled to 22.05 kHz, padded to 4 s, peak<=1
        assert s["waveform"].shape == (int(22050 * 4.0),)
        assert np.abs(s["waveform"]).max() <= 1.0 + 1e-6
        assert s["label"] == 1


class TestPushToHub:
    def test_skips_without_token(self, monkeypatch, capsys):
        from audio_transformers_tpu.utils.hub import push_to_hub

        monkeypatch.delenv("HF_ACCESS", raising=False)
        assert push_to_hub("/tmp/nowhere", "user/repo") is False
        assert "HF_ACCESS not set" in capsys.readouterr().out

    def test_api_plumbing(self, monkeypatch, tmp_path):
        calls = {}

        class FakeApi:
            def __init__(self, token=None):
                calls["token"] = token

            def create_repo(self, repo_id, exist_ok=False):
                calls["repo"] = (repo_id, exist_ok)

            def upload_folder(self, folder_path, repo_id, path_in_repo,
                              commit_message):
                calls["upload"] = (folder_path, repo_id, path_in_repo)

        fake_mod = types.SimpleNamespace(HfApi=FakeApi)
        monkeypatch.setitem(sys.modules, "huggingface_hub", fake_mod)
        from audio_transformers_tpu.utils.hub import push_to_hub

        ok = push_to_hub(str(tmp_path), "user/repo", token="tkn")
        assert ok is True
        assert calls["token"] == "tkn"
        assert calls["repo"] == ("user/repo", True)
        assert calls["upload"] == (str(tmp_path), "user/repo", ".")


def _hub_reachable() -> bool:
    if os.environ.get("ATX_FORCE_NETWORK_TESTS"):
        return True
    import socket
    try:
        socket.create_connection(("huggingface.co", 443), timeout=3).close()
        return True
    except OSError:
        return False


@pytest.mark.skipif(not _hub_reachable(), reason="HF hub unreachable")
class TestNetworkedSmoke:
    """Real-hub smoke: runs only on networked machines (zero egress here).
    Set ATX_FORCE_NETWORK_TESTS=1 to force."""

    def test_whisper_text_tokenizer_roundtrip(self):
        from audio_transformers_tpu.data.tokenizer import WhisperTextTokenizer

        tok = WhisperTextTokenizer()
        ids = tok.encode("hello world")
        assert tok.pad_token_id == 50257
        assert "hello world" in tok.decode(ids).strip()

    def test_expresso_loads(self):
        from audio_transformers_tpu.data.expresso import create_dataset

        tr, va, te, style_to_idx = create_dataset(ByteTokenizer(),
                                                  data_percentage=0.01)
        assert "longform" not in style_to_idx
        assert tr.num_samples > 0
