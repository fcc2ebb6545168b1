"""Pipeline post-processing contracts + end-to-end tiny run.

Repetition-truncation cases mirror the reference behavior
(/root/reference/tests/test_truncate_repetitions.py semantics).
"""

import numpy as np
import pytest

from tiny_audio_tpu.pipeline import ASRPipeline, _strip_think, truncate_repetitions
from tiny_audio_tpu.utils.audio_io import read_wav, resample, write_wav


class TestTruncateRepetitions:
    def test_repeated_characters(self):
        assert truncate_repetitions("444444") == "4"
        assert truncate_repetitions("hello worldddd") == "hello world"
        assert truncate_repetitions("testttt") == "test"

    def test_repeated_words(self):
        assert truncate_repetitions("the the the the") == "the"
        assert truncate_repetitions("hello world world world world") == "hello world"

    def test_repeated_phrases(self):
        assert truncate_repetitions("i am sorry i am sorry i am sorry") == "i am sorry"
        assert (
            truncate_repetitions("hello there i am sorry i am sorry i am sorry")
            == "hello there i am sorry"
        )

    def test_long_repeated_phrases(self):
        phrase = "i am sorry but i cannot speak for the other members of the council"
        assert truncate_repetitions(" ".join([phrase] * 5)) == phrase

    def test_no_repetition(self):
        assert truncate_repetitions("this is fine") == "this is fine"
        assert truncate_repetitions("hello world") == "hello world"

    def test_edge_cases(self):
        assert truncate_repetitions("") == ""
        assert truncate_repetitions("single") == "single"
        assert truncate_repetitions("two words") == "two words"

    def test_min_repeats_threshold(self):
        assert truncate_repetitions("word word") == "word word"
        assert truncate_repetitions("word word word") == "word"


def test_strip_think():
    assert _strip_think("<think>reasoning</think> hello") == "hello"
    assert _strip_think("no tags here") == "no tags here"
    assert _strip_think("<think>multi\nline</think>x") == "x"


def test_wav_roundtrip(tmp_path, rng):
    audio = np.clip((rng.standard_normal(16000) * 0.3), -0.99, 0.99).astype(np.float32)
    path = tmp_path / "t.wav"
    write_wav(path, audio, 16000)
    loaded, rate = read_wav(path)
    assert rate == 16000
    np.testing.assert_allclose(loaded, audio, atol=1e-3)


def test_resample():
    t = np.arange(8000) / 8000.0
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    out = resample(tone, 8000, 16000)
    assert abs(len(out) - 16000) <= 1


def test_extract_audio_formats(tmp_path, rng):
    audio = (rng.standard_normal(16000) * 0.3).astype(np.float32)
    path = tmp_path / "t.wav"
    write_wav(path, audio, 16000)

    for inp in [
        str(path),
        path.read_bytes(),
        audio,
        {"array": audio, "sampling_rate": 16000},
        {"raw": audio, "sampling_rate": 16000},
    ]:
        out = ASRPipeline.extract_audio(inp)
        assert out["sampling_rate"] == 16000
        assert np.abs(out["array"]).max() > 0

    # 8 kHz input gets resampled
    out = ASRPipeline.extract_audio({"array": audio[:8000], "sampling_rate": 8000})
    assert abs(len(out["array"]) - 16000) <= 1


@pytest.fixture(scope="module")
def tiny_pipeline():
    from tiny_audio_tpu.config import tiny_test_config
    from tiny_audio_tpu.models.asr import ASRModel
    from tiny_audio_tpu.processing import ASRProcessor

    cfg = tiny_test_config()
    cfg.model_dtype = "float32"
    cfg.max_new_tokens = 8
    model = ASRModel(cfg, seed=0)
    proc = ASRProcessor(
        model.tokenizer, projector=model.projector,
        num_mel_bins=cfg.encoder.num_mel_bins, mel_buckets=(100,),
    )
    return ASRPipeline(model, proc)


def test_pipeline_end_to_end(tiny_pipeline, tmp_path, rng):
    audio = (rng.standard_normal(12000) * 0.1).astype(np.float32)
    path = tmp_path / "utt.wav"
    write_wav(path, audio, 16000)
    out = tiny_pipeline(str(path))
    assert "text" in out
    assert isinstance(out["text"], str)
    # deterministic across calls
    out2 = tiny_pipeline(str(path))
    assert out["text"] == out2["text"]


def test_pipeline_custom_prompt(tiny_pipeline, rng):
    audio = (rng.standard_normal(12000) * 0.1).astype(np.float32)
    out = tiny_pipeline({"array": audio, "sampling_rate": 16000},
                        user_prompt="Describe the audio")
    assert "text" in out


def test_pipeline_rejects_non_finite_audio(tiny_pipeline):
    """NaN/Inf input must fail loudly, not decode into confident junk
    (the serving fuzz found NaN PCM returning 200 with garbage text)."""
    bad = np.full(8000, np.nan, np.float32)
    with pytest.raises(ValueError, match="non-finite"):
        tiny_pipeline({"array": bad, "sampling_rate": 16000})
    inf = np.zeros(8000, np.float32)
    inf[100] = np.inf
    with pytest.raises(ValueError, match="non-finite"):
        ASRPipeline.extract_audio(inf)


def test_pipeline_confidence(tiny_pipeline, rng):
    """return_confidence: exp(mean chosen-token logp) in (0, 1], absent by
    default, and the text itself is unchanged by the scored graph."""
    audio = (rng.standard_normal(12000) * 0.1).astype(np.float32)
    inputs = {"array": audio, "sampling_rate": 16000}
    plain = tiny_pipeline(inputs)
    assert "confidence" not in plain
    out = tiny_pipeline(inputs, return_confidence=True)
    assert out["text"] == plain["text"]
    assert 0.0 < out["confidence"] <= 1.0


class TestLongFormChunking:
    """Long-form audio is split into encoder-window chunks and transcripts
    joined (reference asr_pipeline.py:204-220 inherits HF chunking)."""

    def test_long_audio_chunks(self, monkeypatch):
        import numpy as np

        from tiny_audio_tpu.config import tiny_test_config
        from tiny_audio_tpu.models.asr import ASRModel
        from tiny_audio_tpu.pipeline import ASRPipeline

        model = ASRModel(tiny_test_config(model_dtype="float32"), seed=0)
        pipe = ASRPipeline(model)
        calls = []

        def fake_generate(feats, mask, **kw):
            shape = np.asarray(feats).shape
            calls.append(shape)
            return np.zeros((shape[0], 4), np.int32)

        monkeypatch.setattr(pipe.model, "generate", fake_generate)
        audio = np.zeros(int(2.5 * 16000), np.float32)
        pipe(audio, chunk_length_s=1.0)
        # 2 full 1s chunks batched together + the 0.5s tail separately
        assert len(calls) == 2
        assert calls[0][0] == 2 and calls[1][0] == 1

    def test_longform_batch_capped(self, monkeypatch):
        import numpy as np

        from tiny_audio_tpu.config import tiny_test_config
        from tiny_audio_tpu.models.asr import ASRModel
        from tiny_audio_tpu.pipeline import ASRPipeline

        model = ASRModel(tiny_test_config(model_dtype="float32"), seed=0)
        pipe = ASRPipeline(model)
        calls = []

        def fake_generate(feats, mask, **kw):
            shape = np.asarray(feats).shape
            calls.append(shape[0])
            return np.zeros((shape[0], 4), np.int32)

        monkeypatch.setattr(pipe.model, "generate", fake_generate)
        # 20 equal 1 s chunks -> sub-batches of LONGFORM_BATCH (8, 8, 4)
        pipe(np.zeros(20 * 16000, np.float32), chunk_length_s=1.0)
        assert calls == [8, 8, 4]

    def test_longform_groups_pad_to_power_of_two(self, monkeypatch):
        """A 13-chunk input makes groups (8, 5); the 5 pads to batch 8 so
        only power-of-2 generate shapes ever compile (warmup covers them)."""
        import numpy as np

        from tiny_audio_tpu.config import tiny_test_config
        from tiny_audio_tpu.models.asr import ASRModel
        from tiny_audio_tpu.pipeline import ASRPipeline

        model = ASRModel(tiny_test_config(model_dtype="float32"), seed=0)
        pipe = ASRPipeline(model)
        calls = []

        def fake_generate(feats, mask, **kw):
            shape = np.asarray(feats).shape
            calls.append(shape[0])
            # distinct tokens per row so padded-row output leakage would show
            return np.tile(np.arange(shape[0], dtype=np.int32)[:, None] + 2,
                           (1, 4))

        monkeypatch.setattr(pipe.model, "generate", fake_generate)
        monkeypatch.setattr(
            pipe, "postprocess_tokens", lambda toks: f"c{int(toks[0])}"
        )
        result = pipe(np.zeros(13 * 16000, np.float32), chunk_length_s=1.0)
        assert calls == [8, 8]
        # 13 real chunk texts; the 3 padded rows of the second group dropped
        assert result["text"].split() == (
            [f"c{i + 2}" for i in range(8)] + [f"c{i + 2}" for i in range(5)]
        )

    def test_short_audio_single_chunk(self, monkeypatch):
        import numpy as np

        from tiny_audio_tpu.config import tiny_test_config
        from tiny_audio_tpu.models.asr import ASRModel
        from tiny_audio_tpu.pipeline import ASRPipeline

        model = ASRModel(tiny_test_config(model_dtype="float32"), seed=0)
        pipe = ASRPipeline(model)
        calls = []

        def fake_generate(feats, mask, **kw):
            calls.append(1)
            return np.zeros((1, 4), np.int32)

        monkeypatch.setattr(pipe.model, "generate", fake_generate)
        pipe(np.zeros(16000, np.float32))
        assert len(calls) == 1


class TestTranscribeBatch:
    def test_batched_matches_solo(self, monkeypatch):
        """transcribe_batch on N clips returns the same texts as N solo calls
        (same model, same shapes up to batch padding)."""
        import numpy as np

        from tiny_audio_tpu.config import tiny_test_config
        from tiny_audio_tpu.models.asr import ASRModel
        from tiny_audio_tpu.pipeline import ASRPipeline

        model = ASRModel(tiny_test_config(model_dtype="float32"), seed=0)
        pipe = ASRPipeline(model)
        rng = np.random.default_rng(0)
        clips = [
            (0.1 * rng.standard_normal(16000)).astype(np.float32)
            for _ in range(3)
        ]
        solo = [pipe(c)["text"] for c in clips]
        batched = pipe.transcribe_batch(clips)
        assert batched == solo

    def test_rejects_longform(self):
        import numpy as np
        import pytest

        from tiny_audio_tpu.config import tiny_test_config
        from tiny_audio_tpu.models.asr import ASRModel
        from tiny_audio_tpu.pipeline import ASRPipeline

        pipe = ASRPipeline(ASRModel(tiny_test_config(model_dtype="float32"),
                                    seed=0))
        with pytest.raises(ValueError, match="long-form"):
            pipe.transcribe_batch([np.zeros(31 * 16000 * 2, np.float32)])

    def test_oversized_batch_splits_into_buckets(self):
        """> BATCH_BUCKETS[-1] clips split into warmed bucket-sized
        sub-batches instead of compiling a new rounded-up shape (ADVICE r2)."""
        import numpy as np

        from tiny_audio_tpu.config import tiny_test_config
        from tiny_audio_tpu.models.asr import ASRModel
        from tiny_audio_tpu.pipeline import ASRPipeline

        model = ASRModel(tiny_test_config(model_dtype="float32"), seed=0)
        pipe = ASRPipeline(model)
        seen_batches = []
        orig = model.generate

        def spy(feats, mask, **kw):
            seen_batches.append(int(np.asarray(feats).shape[0]))
            return orig(feats, mask, **kw)

        model.generate = spy
        rng = np.random.default_rng(1)
        n = pipe.BATCH_BUCKETS[-1] + 2
        clips = [
            (0.1 * rng.standard_normal(8000)).astype(np.float32)
            for _ in range(n)
        ]
        texts = pipe.transcribe_batch(clips)
        assert len(texts) == n
        assert all(b in pipe.BATCH_BUCKETS for b in seen_batches)
        assert len(seen_batches) == 2
