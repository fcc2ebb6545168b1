"""Config contract tests (mirrors reference tests/test_asr_config.py intent)."""

import numpy as np

from tiny_audio_tpu.config import (
    ASRConfig,
    DEFAULT_ENCODER_CONV_LAYERS,
    compute_encoder_output_length,
    tiny_test_config,
)


def test_conv_formula_ints():
    # default layers: (1,3,1) then (1,3,2) => 2x downsample
    assert compute_encoder_output_length(3000) == 1500
    assert compute_encoder_output_length(100) == 50
    assert compute_encoder_output_length(99) == 50
    # identity check against the explicit formula
    length = 777
    for p, k, s in DEFAULT_ENCODER_CONV_LAYERS:
        length = (length + 2 * p - (k - 1) - 1) // s + 1
    assert compute_encoder_output_length(777) == length


def test_conv_formula_arrays():
    lens = np.array([3000, 100, 99, 1])
    out = compute_encoder_output_length(lens)
    assert out.tolist() == [1500, 50, 50, 1]


def test_config_roundtrip(tmp_path):
    cfg = tiny_test_config(projector_type="moe", use_lora=True)
    cfg.save_pretrained(tmp_path)
    loaded = ASRConfig.from_pretrained(tmp_path)
    assert loaded.projector_type == "moe"
    assert loaded.use_lora is True
    assert loaded.decoder.vocab_size == cfg.decoder.vocab_size
    assert loaded.encoder.d_model == cfg.encoder.d_model
    assert loaded.encoder_conv_layers == [(1, 3, 1), (1, 3, 2)]


def test_dims_autofilled():
    cfg = tiny_test_config()
    assert cfg.encoder_dim == cfg.encoder.d_model
    assert cfg.llm_dim == cfg.decoder.hidden_size


def test_generation_defaults():
    cfg = ASRConfig()
    assert cfg.num_beams == 1
    assert cfg.max_new_tokens == 128
    assert cfg.repetition_penalty == 1.0
    assert cfg.use_cache is True
    assert cfg.do_sample is False


class TestBucketFrames:
    def test_within_buckets(self):
        from tiny_audio_tpu.processing import bucket_frames

        assert bucket_frames(1) == 500
        assert bucket_frames(500) == 500
        assert bucket_frames(501) == 1000
        assert bucket_frames(3000) == 3000

    def test_past_last_bucket_continues_step(self):
        """Regression: 3100 frames rounded to 6000 (ceil to multiples of the
        last bucket), nearly doubling mel+encoder compute past 30 s; the
        step pattern must continue instead (3100 -> 3500)."""
        from tiny_audio_tpu.processing import bucket_frames

        assert bucket_frames(3100) == 3500
        assert bucket_frames(3500) == 3500
        assert bucket_frames(3501) == 4000
        assert bucket_frames(6001) == 6500

    def test_single_bucket_list(self):
        from tiny_audio_tpu.processing import bucket_frames

        assert bucket_frames(150, buckets=(100,)) == 200
