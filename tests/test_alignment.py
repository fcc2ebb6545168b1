"""Forced aligner: CTC trellis/backtrack + word-span pairing on synthetic
emissions (the reference's test_alignment.py tier-1 pattern, SURVEY.md §4)."""

import numpy as np
import pytest

from tiny_audio_tpu.alignment import ForcedAligner
from tiny_audio_tpu.models.wav2vec2 import CTC_LABELS
from tiny_audio_tpu.ops.ctc import ctc_backtrack, ctc_trellis

DICT = {c: i for i, c in enumerate(CTC_LABELS)}


def planted_emission(char_frames: list[tuple[str, int]], frames_per=4):
    """Emission matrix strongly favoring each char for `frames_per` frames,
    blanks elsewhere."""
    total = sum(n for _, n in char_frames)
    em = np.full((total, len(CTC_LABELS)), -10.0, np.float32)
    t = 0
    for char, n in char_frames:
        for _ in range(n):
            em[t, DICT[char]] = 0.0
            t += 1
    return em


class TestTrellis:
    def test_planted_path_recovered(self):
        # H at frames 0-3, blank 4-7, I at 8-11
        em = planted_emission([("H", 4), ("-", 4), ("I", 4)])
        tokens = np.array([DICT["H"], DICT["I"]], np.int32)
        import jax.numpy as jnp

        trellis, moved = ctc_trellis(jnp.asarray(em), jnp.asarray(tokens))
        spans = ctc_backtrack(np.asarray(trellis), np.asarray(moved), tokens)
        assert [s[0] for s in spans] == list(tokens)
        (tok_h, h0, h1), (tok_i, i0, i1) = spans
        assert h0 <= 3 and i1 >= 8  # planted regions
        assert h1 <= i0  # monotonic, non-overlapping

    def test_unreachable_falls_back_uniform(self):
        em = planted_emission([("-", 4)])  # all blank
        tokens = np.array([DICT["H"], DICT["I"], DICT["X"]], np.int32)
        import jax.numpy as jnp

        # emission too short for 3 tokens at -10 each still yields a path;
        # force unreachable with a 1-frame emission and 3 tokens
        em1 = em[:1]
        trellis, moved = ctc_trellis(jnp.asarray(em1), jnp.asarray(tokens))
        spans = ctc_backtrack(np.asarray(trellis), np.asarray(moved), tokens)
        assert len(spans) == 3  # uniform fallback keeps one span per token


class TestAlignEmissions:
    FRAME_S = 0.02

    def test_basic_two_words(self):
        em = planted_emission(
            [("H", 4), ("I", 4), ("|", 4), ("G", 4), ("O", 4)]
        )
        out = ForcedAligner.align_emissions(em, "hi go", self.FRAME_S)
        assert [w["word"] for w in out] == ["hi", "go"]
        assert all("fallback" not in w for w in out)
        assert out[0]["start"] <= out[0]["end"] <= out[1]["start"] + 1e-6
        assert out[1]["end"] > out[1]["start"]

    def test_oov_word_does_not_desync(self):
        """Regression: '123' tokenizes to nothing; its neighbors must keep
        their own acoustic spans and '123' gets interpolated + tagged."""
        em = planted_emission(
            [("H", 4), ("I", 4), ("|", 4), ("G", 4), ("O", 4)]
        )
        out = ForcedAligner.align_emissions(em, "hi 123 go", self.FRAME_S)
        assert [w["word"] for w in out] == ["hi", "123", "go"]
        hi, oov, go = out
        assert "fallback" not in hi and "fallback" not in go
        assert oov["fallback"] is True
        # go keeps its planted acoustics (G starts at frame 12 = 0.24 s,
        # minus the 0.06 s START_OFFSET)
        assert go["start"] >= 0.1
        assert go["end"] > go["start"]
        # interpolated word sits between its neighbors
        assert hi["end"] <= oov["start"] + 1e-6
        assert oov["end"] <= go["start"] + 1e-6

    def test_all_oov_returns_empty(self):
        em = planted_emission([("-", 8)])
        assert ForcedAligner.align_emissions(em, "123 456", self.FRAME_S) == []

    def test_trailing_oov_gets_clip_end(self):
        em = planted_emission([("H", 4), ("I", 4)])
        out = ForcedAligner.align_emissions(em, "hi 99", self.FRAME_S)
        assert [w["word"] for w in out] == ["hi", "99"]
        assert out[1]["fallback"] is True
        # bounded by clip end, but never behind its predecessor (END_OFFSET
        # can push the previous word's end past the raw clip end)
        assert out[1]["end"] >= max(8 * self.FRAME_S - 0.04, out[1]["start"])
        assert out[1]["start"] == out[0]["end"]


class TestWeightlessFallback:
    def test_uniform_spans_tagged(self):
        audio = np.zeros(16000, np.float32)
        assert not ForcedAligner.has_model()
        out = ForcedAligner.align(audio, "one two")
        assert [w["word"] for w in out] == ["one", "two"]
        assert all(w["fallback"] is True for w in out)
        assert out[0]["start"] == 0.0 and out[1]["end"] == pytest.approx(1.0)


class TestBucketedEmissions:
    """The jitted, length-bucketed emission forward must be exact on real
    frames vs the unpadded forward (masked GroupNorm stats, zeroed rows
    before the positional conv, masked attention keys)."""

    def test_padded_matches_exact(self):
        import jax
        import jax.numpy as jnp

        from tiny_audio_tpu.models.wav2vec2 import (
            Wav2Vec2CTC,
            conv_frame_count,
        )

        model = Wav2Vec2CTC()
        n = 5000
        rng = np.random.default_rng(0)
        wav = rng.standard_normal(n).astype(np.float32) * 0.1
        params = model.init(
            jax.random.PRNGKey(0), jnp.asarray(wav[None])
        )["params"]
        exact = np.asarray(model.apply({"params": params}, wav[None]))[0]
        padded_wav = np.zeros(16000, np.float32)
        padded_wav[:n] = wav
        padded = np.asarray(model.apply(
            {"params": params}, padded_wav[None], n_samples=jnp.int32(n)
        ))[0]
        t = conv_frame_count(n)
        assert exact.shape[0] == t
        np.testing.assert_allclose(padded[:t], exact, atol=2e-4)

    def test_aligner_uses_one_graph_per_bucket(self, monkeypatch):
        """_emissions pads to SAMPLE_BUCKETS: distinct in-bucket lengths
        hit the same jitted shape."""
        import jax
        import jax.numpy as jnp

        from tiny_audio_tpu.alignment import ForcedAligner, _bucket_samples
        from tiny_audio_tpu.models.wav2vec2 import Wav2Vec2CTC

        assert _bucket_samples(3000) == 80000
        assert _bucket_samples(80000) == 80000
        assert _bucket_samples(80001) == 160000
        assert _bucket_samples(480001) == 560000  # step continues past top

        model = Wav2Vec2CTC()
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 1280), jnp.float32)
        )["params"]
        monkeypatch.setattr(ForcedAligner, "_model", model)
        monkeypatch.setattr(ForcedAligner, "_params", params)
        monkeypatch.setattr(ForcedAligner, "_jit_apply", None)

        shapes = []
        orig = Wav2Vec2CTC.apply

        def spy(self, variables, w, *a, **k):
            shapes.append(w.shape)
            return orig(self, variables, w, *a, **k)

        monkeypatch.setattr(Wav2Vec2CTC, "apply", spy)
        rng = np.random.default_rng(1)
        e1 = ForcedAligner._emissions(
            rng.standard_normal(7000).astype(np.float32)
        )
        e2 = ForcedAligner._emissions(
            rng.standard_normal(9000).astype(np.float32)
        )
        # jit traces ONCE for the shared bucket shape: both lengths reuse
        # one graph, so the underlying apply ran a single time
        assert shapes == [(1, 80000)]
        from tiny_audio_tpu.models.wav2vec2 import conv_frame_count

        assert e1.shape[0] == conv_frame_count(7000)
        assert e2.shape[0] == conv_frame_count(9000)
