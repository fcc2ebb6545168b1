"""Collator: label normalization, validity filters, chat-ML label masking.

Pins the same semantics the reference tests pin (test_label_normalization.py,
test_data_collator.py): assistant tokens supervised, prompt/system/audio
masked, oversized/invalid rows dropped.
"""

import numpy as np
import pytest

from tiny_audio_tpu.config import tiny_test_config
from tiny_audio_tpu.models.projectors import create_projector
from tiny_audio_tpu.tokenization import ByteTokenizer
from tiny_audio_tpu.train.collator import (
    DataCollator,
    MultiTaskDataCollator,
    mask_labels_chatml,
    normalize_label,
)


class TestNormalizeLabel:
    def test_lowercase_and_whitespace(self):
        assert normalize_label("  Hello   WORLD  ") == "hello world"

    def test_corpus_markers(self):
        assert normalize_label("hi <comma> there <unk>") == "hi there"
        assert normalize_label("<noise> <laugh> word") == "word"
        assert normalize_label("a <clear_throat> b <inaudible> c") == "a b c"

    def test_tedlium_brackets(self):
        assert normalize_label("so [ medicine ] yes") == "so yes"

    def test_percent(self):
        assert normalize_label("50% done") == "50 percent done"
        assert normalize_label("5 per cent") == "5 percent"

    def test_empty(self):
        assert normalize_label("") == ""
        assert normalize_label("<unk>") == ""
        assert normalize_label(None) == ""


@pytest.fixture(scope="module")
def collator():
    import jax.numpy as jnp

    cfg = tiny_test_config()
    proj = create_projector(cfg, dtype=jnp.float32, param_dtype=jnp.float32)
    return DataCollator(
        ByteTokenizer(512), proj,
        num_mel_bins=cfg.encoder.num_mel_bins,
        system_prompt="You are a helpful assistant.",
        mel_buckets=(100, 200), pad_text_multiple=8,
    )


def _row(audio, text, **extra):
    return {"audio": {"array": audio}, "text": text, **extra}


def test_collator_batch_shapes(collator, rng):
    batch = collator(
        [
            _row((rng.standard_normal(16000) * 0.1).astype(np.float32), "hello"),
            _row((rng.standard_normal(8000) * 0.1).astype(np.float32), "world two"),
        ]
    )
    b, t = batch["input_ids"].shape
    assert b == 2
    assert t % 8 == 0
    assert batch["labels"].shape == (b, t)
    assert batch["input_features"].shape[0] == 2
    assert batch["audio_token_counts"].shape == (2,)


def test_collator_drops_invalid_rows(collator, rng):
    good = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    batch = collator(
        [
            _row(good, "keep me"),
            _row(np.array([], np.float32), "empty audio"),
            _row(np.full(100, np.nan, np.float32), "nan audio"),
            _row(good, "<unk>"),  # label normalizes to empty
            _row((rng.standard_normal(16000 * 31) * 0.1).astype(np.float32), "too long"),
        ]
    )
    assert batch["input_ids"].shape[0] == 1


def test_collator_all_invalid_raises(collator):
    with pytest.raises(ValueError):
        collator([_row(np.array([], np.float32), "x")])


def test_label_masking_semantics(collator, rng):
    tok = collator.tokenizer
    audio = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    batch = collator([_row(audio, "hello world")])
    ids = batch["input_ids"][0]
    labels = batch["labels"][0]
    attn = batch["attention_mask"][0]

    # audio placeholders are masked
    audio_positions = ids == tok.audio_token_id
    assert audio_positions.sum() == batch["audio_token_counts"][0]
    assert (labels[audio_positions] == -100).all()
    # padding is masked
    assert (labels[attn == 0] == -100).all()
    # the supervised span decodes to the normalized transcript (+ stop token)
    supervised = ids[labels != -100]
    text = tok.decode([int(t) for t in supervised], skip_special_tokens=True)
    assert text.strip() == "hello world"
    # stop token (<|im_end|>) is supervised
    im_end = tok.convert_tokens_to_ids("<|im_end|>")
    assert im_end in supervised.tolist()
    # number of audio tokens equals projector formula on the real mel length
    assert batch["audio_token_counts"][0] == collator.processor.num_audio_tokens(
        8000 // 160
    )


def test_mask_labels_prefix_only():
    tok = ByteTokenizer(512)
    messages = [
        {"role": "system", "content": "sys"},
        {"role": "user", "content": "<audio> hi"},
        {"role": "assistant", "content": "answer"},
    ]
    ids, labels = mask_labels_chatml(tok, messages)
    assert len(ids) == len(labels)
    assert (labels[: np.argmax(labels != -100)] == -100).all()
    sup = tok.decode([int(t) for t in ids[labels != -100]], skip_special_tokens=True)
    assert sup.strip() == "answer"


def test_multitask_collator_sift(rng):
    import jax.numpy as jnp

    cfg = tiny_test_config()
    proj = create_projector(cfg, dtype=jnp.float32, param_dtype=jnp.float32)
    coll = MultiTaskDataCollator(
        ByteTokenizer(512), proj, num_mel_bins=cfg.encoder.num_mel_bins,
        mel_buckets=(100,),
    )
    audio = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    batch = coll(
        [
            _row(audio, "transcript", task="transcribe"),
            _row(audio, "fallback", task="sift", sift_response="Sounds like a test."),
        ]
    )
    tok = coll.tokenizer
    sup1 = tok.decode(
        [int(t) for t in batch["input_ids"][1][batch["labels"][1] != -100]],
        skip_special_tokens=True,
    )
    assert sup1.strip() == "Sounds like a test."


def test_multitask_sift_row_with_empty_text_kept(rng):
    """Regression: the validity filter judged SIFT rows on the transcript
    column, dropping samples whose training label (sift_response) was fine."""
    import jax.numpy as jnp

    cfg = tiny_test_config()
    proj = create_projector(cfg, dtype=jnp.float32, param_dtype=jnp.float32)
    coll = MultiTaskDataCollator(
        ByteTokenizer(512), proj, num_mel_bins=cfg.encoder.num_mel_bins,
        mel_buckets=(100,),
    )
    audio = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    batch = coll(
        [_row(audio, "", task="sift", sift_response="Sounds like speech.")]
    )
    assert batch["input_ids"].shape[0] == 1
    tok = coll.tokenizer
    sup = tok.decode(
        [int(t) for t in batch["input_ids"][0][batch["labels"][0] != -100]],
        skip_special_tokens=True,
    )
    assert sup.strip() == "Sounds like speech."


def test_multitask_asr_labels_normalized(rng):
    """Regression: the multitask ASR branch lowercased instead of running
    normalize_label, so corpus markers survived into supervised output."""
    import jax.numpy as jnp

    cfg = tiny_test_config()
    proj = create_projector(cfg, dtype=jnp.float32, param_dtype=jnp.float32)
    coll = MultiTaskDataCollator(
        ByteTokenizer(512), proj, num_mel_bins=cfg.encoder.num_mel_bins,
        mel_buckets=(100,),
    )
    audio = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    batch = coll([_row(audio, "hello <COMMA> world", task="transcribe")])
    tok = coll.tokenizer
    sup = tok.decode(
        [int(t) for t in batch["input_ids"][0][batch["labels"][0] != -100]],
        skip_special_tokens=True,
    )
    assert sup.strip() == "hello world"
