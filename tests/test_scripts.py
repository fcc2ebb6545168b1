"""Script-layer contracts: train.py model staging, SIFT generator,
tpu_vm command construction, CLI train passthrough."""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _load(name):
    spec = importlib.util.spec_from_file_location(name, REPO / "scripts" / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestTrainBuildModel:
    def test_tiny_model_from_overrides(self):
        train = _load("train")
        cfg = {
            "run": {"tiny_model": True, "seed": 0},
            "model": {"projector_type": "moe", "model_dtype": "float32"},
        }
        model = train.build_model(cfg)
        assert model.config.projector_type == "moe"
        assert model.config.decoder.hidden_size == 64  # tiny towers

    def test_stage2_lora_rebuild_preserves_base(self, tmp_path):
        """pretrained_model_path + use_lora: base weights survive the LoRA
        rebuild (the reference's stage-1 -> stage-2 flow)."""
        train = _load("train")
        stage1 = train.build_model(
            {"run": {"tiny_model": True}, "model": {"model_dtype": "float32"}}
        )
        stage1.save_pretrained(tmp_path)

        stage2 = train.build_model(
            {
                "run": {"tiny_model": True, "pretrained_model_path": str(tmp_path)},
                "model": {
                    "model_dtype": "float32",
                    "use_lora": True,
                    "lora_rank": 4,
                    "freeze_projector": True,
                },
            }
        )
        assert stage2.config.use_lora and stage2.config.freeze_projector
        assert "q_proj_lora_a" in stage2.params["decoder"]["layers"]
        np.testing.assert_allclose(
            np.asarray(stage2.params["decoder"]["layers"]["q_proj"]["kernel"]),
            np.asarray(stage1.params["decoder"]["layers"]["q_proj"]["kernel"]),
        )

    def test_augmentation_wiring(self):
        train = _load("train")
        aug = train.build_augmentation(
            {
                "rir_augmentation": {"enabled": True},
                "noise_augmentation": {"enabled": True},
                "silence_injection_prob": 0.5,
            }
        )
        assert aug is not None and aug.rir is not None and aug.noise is not None
        assert train.build_augmentation({}) is None


class TestSiftGenerator:
    def test_metadata_normalization(self):
        sift = _load("generate_sift_dataset")
        assert sift.age_to_group(25) == "twenties"
        assert sift.age_to_group("fifties") == "fifties"
        assert sift.db_to_volume(-40) == "quiet"
        assert sift.rate_to_pace(5.0) == "brisk"

    def test_generate_rows(self):
        sift = _load("generate_sift_dataset")
        samples = [
            {
                "audio": {"array": np.full(16000, 0.1, np.float32),
                          "sampling_rate": 16000},
                "text": "hello world test",
                "emotion": "Happy",
                "age": 33,
            },
            {"audio": None, "text": ""},  # no attributes -> skipped
        ]
        rows = sift.generate_sift_rows(samples)
        assert len(rows) == 1
        assert rows[0]["sift_response"].startswith("Sounds like")
        assert "happy" in rows[0]["sift_response"]
        assert rows[0]["task"] == "sift"

    def test_custom_captioner(self):
        sift = _load("generate_sift_dataset")
        samples = [{"audio": None, "text": "", "emotion": "sad"}]
        rows = sift.generate_sift_rows(samples, captioner=lambda a: "custom")
        assert rows[0]["sift_response"] == "custom"


class TestTpuVm:
    def test_ssh_base_plain_host(self):
        tpu_vm = _load("tpu_vm")
        assert tpu_vm._ssh_base("user@host")[:1] == ["ssh"]

    def test_ssh_base_gcloud(self):
        tpu_vm = _load("tpu_vm")
        base = tpu_vm._ssh_base("tpu:my-pod")
        assert base[:5] == ["gcloud", "compute", "tpus", "tpu-vm", "ssh"]
        assert "my-pod" in base

    def test_env_forwarding(self, monkeypatch):
        tpu_vm = _load("tpu_vm")
        monkeypatch.setenv("HF_TOKEN", "secret-token")
        exports = tpu_vm._env_exports()
        assert "export HF_TOKEN=secret-token" in exports


class TestDownloadCorpora:
    def test_registry(self):
        dl = _load("download_corpora")
        assert set(dl.CORPORA) == {"rirs", "musan", "fsd50k"}
        for spec in dl.CORPORA.values():
            assert spec["url"].startswith("https://")


class TestHandlerLocal:
    def test_find_latest_checkpoint(self, tmp_path):
        hl = _load("handler_local")
        (tmp_path / "run1" / "model").mkdir(parents=True)
        (tmp_path / "run1" / "model" / "config.json").write_text("{}")
        found = hl.find_latest_checkpoint(tmp_path)
        assert found == tmp_path / "run1" / "model"

    def test_no_checkpoint_exits(self, tmp_path):
        hl = _load("handler_local")
        with pytest.raises(SystemExit):
            hl.find_latest_checkpoint(tmp_path)


class TestDoctor:
    def test_report_structure_cpu(self, monkeypatch):
        monkeypatch.setenv("TA_DOCTOR_PLATFORM", "cpu")
        from tiny_audio_tpu.doctor import run_doctor

        report = run_doctor(probe_timeout_s=240)
        assert report["backend"]["ok"] and report["backend"]["platform"] == "cpu"
        assert report["backend"]["device_count"] >= 1
        assert report["versions"]["jax"]
        assert "available" in report["native_audio"]
        assert report["status"] == "degraded"  # cpu = no accelerator

    def test_probe_timeout_reports_unreachable(self, monkeypatch):
        import tiny_audio_tpu.doctor as doc

        def fake_run(*a, **k):
            import subprocess

            raise subprocess.TimeoutExpired(cmd="probe", timeout=1)

        monkeypatch.setattr(doc.subprocess, "run", fake_run)
        report = doc.run_doctor(probe_timeout_s=1)
        assert report["status"] == "unreachable"
        assert "timeout" in report["backend"]["error"]


class TestBulkTranscribe:
    def test_multi_file_batched_matches_solo(self, tmp_path, capsys):
        """Plain multi-file transcribe coalesces through transcribe_batch
        and must print the same text a solo call produces per file."""
        import wave

        import numpy as np

        from tiny_audio_tpu.config import tiny_test_config
        from tiny_audio_tpu.models.asr import ASRModel

        model = ASRModel(tiny_test_config(model_dtype="float32"), seed=0)
        ckpt = tmp_path / "ckpt"
        model.save_pretrained(str(ckpt))
        rng = np.random.default_rng(0)
        paths = []
        # equal lengths: the batch's audio-token count is the batch max
        # (reference batch semantics), so only equal-length clips are
        # token-exact vs their solo decode on a random-weight model
        for i in range(3):
            p = tmp_path / f"f{i}.wav"
            pcm = (np.clip(rng.standard_normal(8000) * 0.1,
                           -1, 1) * 32767).astype(np.int16)
            with wave.open(str(p), "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(16000)
                w.writeframes(pcm.tobytes())
            paths.append(str(p))

        import sys as _sys

        from tiny_audio_tpu.cli import main

        argv, _sys.argv = _sys.argv, ["ta", "transcribe", "-m", str(ckpt),
                                      "--json", *paths]
        try:
            main()
        finally:
            _sys.argv = argv
        import json as _json

        records = [_json.loads(ln) for ln in
                   capsys.readouterr().out.splitlines() if ln.startswith("{")]
        assert [r["file"] for r in records] == paths
        from tiny_audio_tpu.pipeline import ASRPipeline

        # the CLI contract is "prints the batched path's results per file"
        # (solo-vs-batch text equivalence itself is pinned by
        # test_pipeline.TestTranscribeBatch at non-degenerate shapes)
        pipe = ASRPipeline(ASRModel.from_pretrained(str(ckpt)))
        expected = pipe.transcribe_batch(paths)
        assert [r["text"] for r in records] == expected
