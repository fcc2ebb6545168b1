"""Word-level timestamps via CTC forced alignment.

Re-designed equivalent of ``/root/reference/tiny_audio/alignment.py``: a
character-CTC acoustic model emits 20 ms log-probs, a Viterbi trellis aligns
the transcript characters, and aligned tokens are grouped into words with the
same calibrated bias offsets.  The trellis is a ``lax.scan``
(:mod:`tiny_audio_tpu.ops.ctc`) instead of the reference's O(T·N) Python loop.

Emission model: :class:`~tiny_audio_tpu.models.wav2vec2.Wav2Vec2CTC` with
converted WAV2VEC2_ASR_BASE_960H weights when available
(``ForcedAligner.load_weights``); without weights the aligner emits uniform
spans (the reference's own failure fallback).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tiny_audio_tpu.models.wav2vec2 import (
    CTC_LABELS,
    Wav2Vec2CTC,
    conv_frame_count,
)
from tiny_audio_tpu.ops.ctc import ctc_backtrack, ctc_trellis

FRAME_STRIDE = 320  # samples per CTC frame at 16 kHz -> 20 ms
# Calibrated systematic-bias offsets (reference alignment.py:154-157)
START_OFFSET = 0.06
END_OFFSET = -0.03

#: waveform-length buckets for the jitted emission forward (5 s steps to
#: the 30 s window — the DEFAULT_MEL_BUCKETS grid in samples); past the
#: top the step pattern continues, mirroring processing.bucket_frames
SAMPLE_BUCKETS = tuple(f * 160 for f in (500, 1000, 1500, 2000, 2500, 3000))


def _bucket_samples(n: int) -> int:
    for b in SAMPLE_BUCKETS:
        if n <= b:
            return b
    step = SAMPLE_BUCKETS[-1] - SAMPLE_BUCKETS[-2]
    import math

    return SAMPLE_BUCKETS[-1] + int(
        math.ceil((n - SAMPLE_BUCKETS[-1]) / step) * step
    )


class ForcedAligner:
    """Lazy singleton aligner (mirrors the reference's class-level cache)."""

    _model: Optional[Wav2Vec2CTC] = None
    _params = None
    _jit_apply = None
    _dictionary = {c: i for i, c in enumerate(CTC_LABELS)}

    @classmethod
    def load_weights(cls, path) -> None:
        """Load converted Wav2Vec2-CTC params (flax msgpack file)."""
        from flax import serialization

        cls._model = Wav2Vec2CTC()
        cls._jit_apply = None  # rebind the jitted closure to the new model
        waveform = jnp.zeros((1, FRAME_STRIDE * 4), jnp.float32)
        # eval_shape: from_bytes only needs the tree STRUCTURE — a traced
        # shape evaluation costs nothing, while a real init would dispatch
        # ~95M params of random-init XLA programs at aligner boot
        template = jax.eval_shape(
            cls._model.init, jax.random.PRNGKey(0), waveform
        )["params"]
        cls._params = serialization.from_bytes(
            template, Path(path).read_bytes()
        )

    @classmethod
    def has_model(cls) -> bool:
        return cls._params is not None

    # ------------------------------------------------------------------ core

    @classmethod
    def _emissions(cls, waveform: np.ndarray) -> np.ndarray:
        """[n] samples -> [T, 29] log-probs, via ONE jitted forward on a
        length-bucketed waveform (exact per-frame: see Wav2Vec2CTC's
        ``n_samples`` contract).  The eager per-clip-length apply this
        replaces compiled a fresh graph for every distinct clip duration
        and paid one tunnel dispatch per op (~150 ops) on remote TPUs."""
        assert cls._model is not None
        if cls._jit_apply is None:
            cls._jit_apply = jax.jit(
                lambda p, w, n: cls._model.apply(
                    {"params": p}, w, n_samples=n
                )
            )
        n = int(waveform.shape[-1])
        padded = np.zeros(_bucket_samples(n), np.float32)
        padded[:n] = waveform
        out = cls._jit_apply(
            cls._params, jnp.asarray(padded[None, :]), jnp.int32(n)
        )
        return np.asarray(out[0][: conv_frame_count(n)])

    @classmethod
    def tokenize_transcript(cls, text: str) -> list[int]:
        tokens = []
        for char in text.upper():
            if char in cls._dictionary:
                tokens.append(cls._dictionary[char])
            elif char == " ":
                tokens.append(cls._dictionary["|"])
        return tokens

    @classmethod
    def align_emissions(
        cls, emission: np.ndarray, text: str, frame_duration: float
    ) -> list[dict]:
        """Align a transcript against an emission matrix (testable core).

        Words whose characters are all outside the CTC label set (digits,
        symbols — e.g. "123", "$5") contribute NO tokens, so the span→word
        pairing is built from the words that DID tokenize; token-less words
        get timestamps interpolated between their neighbors and are tagged
        ``"fallback": True`` (the round-1 version advanced the word index
        only on separator spans, silently shifting every timestamp after
        the first such word onto the wrong words).
        """
        separator_id = cls._dictionary["|"]
        words = text.split()
        tokens: list[int] = []
        tokened_words: list[int] = []  # word index per token group, in order
        for i, w in enumerate(words):
            toks = [
                cls._dictionary[c] for c in w.upper() if c in cls._dictionary
            ]
            if not toks:
                continue
            if tokens:
                tokens.append(separator_id)
            tokens.extend(toks)
            tokened_words.append(i)
        if not tokens:
            return []

        trellis, moved = ctc_trellis(
            jnp.asarray(emission, jnp.float32), jnp.asarray(tokens, jnp.int32)
        )
        spans = ctc_backtrack(np.asarray(trellis), np.asarray(moved), np.asarray(tokens))

        by_idx: dict[int, dict] = {}
        group = 0
        cur_start = cur_end = None

        def flush(start, end):
            nonlocal group
            if group < len(tokened_words):
                idx = tokened_words[group]
                by_idx[idx] = {
                    "word": words[idx],
                    "start": max(0.0, start * frame_duration - START_OFFSET),
                    "end": max(0.0, end * frame_duration - END_OFFSET),
                }
            group += 1

        for token_id, start_f, end_f in spans:
            if token_id == separator_id:
                if cur_start is not None and cur_end is not None:
                    flush(cur_start, cur_end)
                cur_start = cur_end = None
            else:
                if cur_start is None:
                    cur_start = start_f
                cur_end = end_f
        if cur_start is not None and cur_end is not None:
            flush(cur_start, cur_end)

        clip_end = emission.shape[0] * frame_duration
        out: list[dict] = []
        for i, w in enumerate(words):
            if i in by_idx:
                out.append(by_idx[i])
            else:
                prev_end = out[-1]["end"] if out else 0.0
                next_start = next(
                    (by_idx[j]["start"] for j in range(i + 1, len(words))
                     if j in by_idx),
                    clip_end,
                )
                out.append({
                    "word": w, "start": prev_end,
                    "end": max(prev_end, next_start), "fallback": True,
                })
        return out

    @classmethod
    def align(
        cls,
        audio: np.ndarray,
        text: str,
        sample_rate: int = 16000,
    ) -> list[dict]:
        """Word-level timestamps for ``text`` against ``audio``."""
        audio = np.asarray(audio, np.float32).squeeze()
        if sample_rate != 16000:
            from tiny_audio_tpu.utils.audio_io import resample

            audio = resample(audio, sample_rate, 16000)

        if not cls.has_model():
            # Uniform fallback: evenly spread words over the clip duration —
            # tagged so callers/evaluators can't mistake it for real alignment
            words = text.split()
            if not words:
                return []
            duration = len(audio) / 16000.0
            per = duration / len(words)
            return [
                {"word": w, "start": i * per, "end": (i + 1) * per,
                 "fallback": True}
                for i, w in enumerate(words)
            ]

        emission = cls._emissions(audio)
        return cls.align_emissions(emission, text, FRAME_STRIDE / 16000.0)
