"""ASRProcessor: audio feature extraction + chat-prompt tokenization.

Re-designed equivalent of ``/root/reference/tiny_audio/asr_processing.py``:
computes mel features with the fused TPU front-end (instead of the CPU
``WhisperFeatureExtractor``), derives per-sample ``<audio>`` token counts via
the conv formula + projector output-length, and builds the chat-templated
prompt.  Mel lengths are padded to a small set of static buckets so repeated
calls reuse compiled graphs (XLA static-shape discipline).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Union

import numpy as np

from tiny_audio_tpu.config import (
    DEFAULT_ENCODER_CONV_LAYERS,
    compute_encoder_output_length,
)
from tiny_audio_tpu.ops import mel
from tiny_audio_tpu.tokenization import AUDIO_TOKEN

# Default mel-frame buckets: 5s steps up to the 30s encoder window.
DEFAULT_MEL_BUCKETS = (500, 1000, 1500, 2000, 2500, 3000)


def bucket_frames(n_frames: int, buckets: Sequence[int] = DEFAULT_MEL_BUCKETS) -> int:
    for b in buckets:
        if n_frames <= b:
            return b
    # past the last bucket, CONTINUE its step pattern (a 3100-frame clip
    # rounds to 3500, not to 6000 — rounding up in whole multiples of the
    # last bucket nearly doubled mel+encoder compute just past 30 s)
    step = buckets[-1] - buckets[-2] if len(buckets) > 1 else buckets[-1]
    return buckets[-1] + int(math.ceil((n_frames - buckets[-1]) / step) * step)


class ASRProcessor:
    """Feature extractor + tokenizer wrapper.

    ``whisper_mode`` pads every clip to the fixed 3000-frame window (the
    reference's Whisper branch, asr_modeling.py:190-201); otherwise
    variable-length bucketed padding (GLM branch).
    """

    AUDIO_TOKEN = AUDIO_TOKEN
    TRANSCRIBE_PROMPT = "Transcribe the speech to text"

    def __init__(
        self,
        tokenizer,
        projector=None,
        num_mel_bins: int = 128,
        encoder_conv_layers: Optional[list] = None,
        whisper_mode: bool = False,
        mel_buckets: Sequence[int] = DEFAULT_MEL_BUCKETS,
        sampling_rate: int = 16000,
    ):
        self.tokenizer = tokenizer
        self.projector = projector
        self.num_mel_bins = num_mel_bins
        self.encoder_conv_layers = encoder_conv_layers or DEFAULT_ENCODER_CONV_LAYERS
        self.whisper_mode = whisper_mode
        self.mel_buckets = tuple(mel_buckets)
        self.sampling_rate = sampling_rate
        self.audio_token_id = tokenizer.audio_token_id

    # ----------------------------------------------------------------- audio

    def extract_features(
        self, audio: Union[np.ndarray, Sequence[np.ndarray]]
    ) -> dict:
        """Batch mel extraction with bucketed padding.

        Returns {"input_features": [B, mel, T], "audio_attention_mask": [B, T]}.
        """
        if isinstance(audio, np.ndarray) and audio.ndim == 1:
            audio = [audio]
        arrays = [np.asarray(a, dtype=np.float32) for a in audio]
        lengths = np.array([a.shape[-1] for a in arrays])

        if self.whisper_mode:
            n_samples = mel.N_SAMPLES
        else:
            max_frames = int(math.ceil(lengths.max() / mel.HOP_LENGTH))
            n_samples = bucket_frames(max_frames, self.mel_buckets) * mel.HOP_LENGTH

        batch = np.zeros((len(arrays), n_samples), dtype=np.float32)
        for i, a in enumerate(arrays):
            n = min(a.shape[-1], n_samples)
            batch[i, :n] = a[:n]

        feats = mel.log_mel_spectrogram(batch, num_mel_bins=self.num_mel_bins)
        n_frames = n_samples // mel.HOP_LENGTH
        mask = mel.frame_attention_mask(np.minimum(lengths, n_samples), n_frames)
        return {
            "input_features": feats,
            "audio_attention_mask": mask,
            "mel_lengths": np.minimum(
                np.ceil(lengths / mel.HOP_LENGTH).astype(int), n_frames
            ),
        }

    # ------------------------------------------------------------------ text

    def num_audio_tokens(self, mel_length) -> int:
        enc_len = compute_encoder_output_length(mel_length, self.encoder_conv_layers)
        if self.projector is None:
            return enc_len
        return self.projector.get_output_length(enc_len)

    def build_messages(
        self,
        num_audio_tokens: int,
        text: Optional[str] = None,
        system_prompt: Optional[str] = None,
        user_prompt: Optional[str] = None,
    ) -> list[dict]:
        prompt = self.TRANSCRIBE_PROMPT if user_prompt is None else user_prompt
        if num_audio_tokens > 0:
            user_content = self.AUDIO_TOKEN * num_audio_tokens
            if prompt:
                user_content += " " + prompt
        else:
            user_content = prompt or ""
        messages = []
        if system_prompt:
            messages.append({"role": "system", "content": system_prompt})
        messages.append({"role": "user", "content": user_content})
        if text is not None:
            messages.append({"role": "assistant", "content": text})
        return messages

    def __call__(
        self,
        audio=None,
        text: Optional[str] = None,
        system_prompt: Optional[str] = None,
        user_prompt: Optional[str] = None,
    ) -> dict:
        """Process audio (and optional target text) for inference/training.

        Mirrors reference asr_processing.py:51-128: token count from the
        *batch-max real* mel length, prompt with N placeholders.
        """
        result: dict = {}
        n_audio = 0
        if audio is not None:
            feats = self.extract_features(audio)
            result["input_features"] = feats["input_features"]
            result["audio_attention_mask"] = feats["audio_attention_mask"]
            real_mel = int(np.asarray(feats["audio_attention_mask"]).sum(-1).max())
            n_audio = int(self.num_audio_tokens(real_mel))

        messages = self.build_messages(n_audio, text, system_prompt, user_prompt)
        ids = self.tokenizer.apply_chat_template(
            messages,
            tokenize=True,
            add_generation_prompt=(text is None),
            enable_thinking=False,
        )
        input_ids = np.asarray(ids, dtype=np.int32)[None, :]
        result["input_ids"] = input_ids
        result["attention_mask"] = np.ones_like(input_ids)
        return result
