"""tiny-audio-tpu: TPU-native speech-LLM ASR framework in JAX/XLA/Pallas.

A ground-up rebuild of alexkroman/tiny-audio's capability surface designed for
TPU: fused mel front-end, one XLA-compiled encoder -> projector -> decoder
graph with KV-cached greedy and streaming generation, forced-alignment
timestamps, diarization, projector/LoRA training stages, and an eval harness.
"""

__version__ = "0.1.0"

from tiny_audio_tpu.config import (  # noqa: F401
    ASRConfig,
    DecoderConfig,
    DEFAULT_ENCODER_CONV_LAYERS,
    EncoderConfig,
    compute_encoder_output_length,
)
