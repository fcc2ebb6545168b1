"""ASRModel composition: splice, loss, freezing, generate, save/load."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tiny_audio_tpu.config import tiny_test_config
from tiny_audio_tpu.models.asr import ASRModel, splice_audio
from tiny_audio_tpu.processing import ASRProcessor


@pytest.fixture(scope="module")
def model():
    cfg = tiny_test_config()
    cfg.model_dtype = "float32"
    return ASRModel(cfg, seed=0)


@pytest.fixture(scope="module")
def train_batch(model, rng):
    """A collated training batch built through the processor."""
    proc = ASRProcessor(
        model.tokenizer,
        projector=model.projector,
        num_mel_bins=model.config.encoder.num_mel_bins,
        mel_buckets=(100, 200),
    )
    audio = [
        (rng.standard_normal(16000) * 0.1).astype(np.float32),
        (rng.standard_normal(24000) * 0.1).astype(np.float32),
    ]
    feats = proc.extract_features(audio)
    rows = []
    for i, text in enumerate(["hello world", "ok"]):
        n = int(proc.num_audio_tokens(int(feats["mel_lengths"][i])))
        messages = proc.build_messages(n, text=text, system_prompt="sys")
        ids = proc.tokenizer.apply_chat_template(
            messages, tokenize=True, add_generation_prompt=False
        )
        rows.append(np.asarray(ids, np.int32))
    max_len = max(len(r) for r in rows)
    input_ids = np.full((2, max_len), model.tokenizer.pad_token_id, np.int32)
    attn = np.zeros((2, max_len), np.int32)
    labels = np.full((2, max_len), -100, np.int32)
    im_start = model.tokenizer.convert_tokens_to_ids("<|im_start|>")
    for i, r in enumerate(rows):
        input_ids[i, : len(r)] = r
        attn[i, : len(r)] = 1
        # label mask: assistant turn only (everything after last <|im_start|>)
        starts = np.where(r == im_start)[0]
        a0 = starts[-1]
        labels[i, a0 + 2 : len(r)] = r[a0 + 2 : len(r)]
    return {
        "input_ids": jnp.asarray(input_ids),
        "attention_mask": jnp.asarray(attn),
        "labels": jnp.asarray(labels),
        "input_features": jnp.asarray(feats["input_features"]),
        "audio_attention_mask": jnp.asarray(feats["audio_attention_mask"]),
    }


def test_splice_audio_matches_loop(rng):
    b, t, h, ta = 2, 9, 4, 5
    text = jnp.asarray(rng.standard_normal((b, t, h)), jnp.float32)
    audio = jnp.asarray(rng.standard_normal((b, ta, h)), jnp.float32)
    mask = np.zeros((b, t), bool)
    mask[0, 2:6] = True  # 4 placeholders
    mask[1, 1:3] = True  # 2 placeholders
    out = np.asarray(splice_audio(text, jnp.asarray(mask), audio))

    ref = np.asarray(text).copy()
    for r in range(b):
        j = 0
        for c in range(t):
            if mask[r, c]:
                ref[r, c] = np.asarray(audio)[r, j]
                j += 1
    np.testing.assert_allclose(out, ref)


def test_loss_finite_and_deterministic(model, train_batch):
    loss1, metrics = model.compute_loss(model.params, train_batch, train=False)
    loss2, _ = model.compute_loss(model.params, train_batch, train=False)
    assert np.isfinite(float(loss1))
    assert float(loss1) == float(loss2)
    assert int(metrics["num_label_tokens"]) > 0


def test_gradients_flow_to_projector_only(model, train_batch):
    def loss_fn(params):
        loss, _ = model.compute_loss(
            params, train_batch, train=True,
            rngs={"dropout": jax.random.PRNGKey(0), "jitter": jax.random.PRNGKey(1)},
        )
        return loss

    grads = jax.grad(loss_fn)(model.params)
    proj_norm = sum(
        float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads["projector"])
    )
    enc_norm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads["encoder"]))
    dec_norm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads["decoder"]))
    assert proj_norm > 0.0
    assert enc_norm == 0.0  # frozen tower
    assert dec_norm == 0.0  # freeze_language_model=True


def test_audio_token_dropout_changes_loss(train_batch):
    cfg = tiny_test_config(audio_token_dropout=0.5)
    cfg.model_dtype = "float32"
    m = ASRModel(cfg, seed=0)
    l_nodrop, _ = m.compute_loss(m.params, train_batch, train=False)
    l_drop, _ = m.compute_loss(
        m.params, train_batch, train=True, rngs={"dropout": jax.random.PRNGKey(7)}
    )
    assert float(l_nodrop) != float(l_drop)


def test_generate_shapes_and_determinism(model, rng):
    audio = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    proc = ASRProcessor(
        model.tokenizer, projector=model.projector,
        num_mel_bins=model.config.encoder.num_mel_bins, mel_buckets=(100,),
    )
    feats = proc.extract_features(audio)
    t1 = model.generate(feats["input_features"], feats["audio_attention_mask"],
                        max_new_tokens=8)
    t2 = model.generate(feats["input_features"], feats["audio_attention_mask"],
                        max_new_tokens=8)
    assert t1.shape == (1, 8)
    np.testing.assert_array_equal(t1, t2)


def test_save_load_roundtrip(model, rng, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ckpt")
    model.save_pretrained(tmp)
    loaded = ASRModel.from_pretrained(tmp)

    audio = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    proc = ASRProcessor(
        model.tokenizer, projector=model.projector,
        num_mel_bins=model.config.encoder.num_mel_bins, mel_buckets=(100,),
    )
    feats = proc.extract_features(audio)
    t1 = model.generate(feats["input_features"], feats["audio_attention_mask"],
                        max_new_tokens=6)
    t2 = loaded.generate(feats["input_features"], feats["audio_attention_mask"],
                         max_new_tokens=6)
    np.testing.assert_array_equal(t1, t2)


def test_from_pretrained_attaches_aux_towers(model, tmp_path_factory):
    """A checkpoint carrying convert_checkpoint's aux-tower artifacts must
    attach them in a FRESH process: conversion attaches in-process only,
    so without this hook serving fell back to uniform-spread timestamps
    and the synthetic speaker-embedder tier silently."""
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from tiny_audio_tpu.diarization import EcapaEmbedder
    from tiny_audio_tpu.models.ecapa import EcapaTDNN

    tmp = tmp_path_factory.mktemp("ckpt_aux")
    model.save_pretrained(tmp)
    # a converted-speechbrain-shaped embedder artifact (tiny geometry —
    # from_converted infers channels/embed/attention from the shapes)
    module = EcapaTDNN(channels=(32, 32, 32, 32, 96), embed_dim=24,
                       attention_channels=16)
    params = module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 75, 80), jnp.float32)
    )["params"]
    (tmp / "ecapa_embedder.msgpack").write_bytes(
        serialization.to_bytes(params)
    )
    # a corrupt aligner artifact: must warn and keep serving, not raise
    (tmp / "wav2vec2_aligner.msgpack").write_bytes(b"not msgpack")

    saved = EcapaEmbedder._instance
    EcapaEmbedder._instance = None
    try:
        ASRModel.from_pretrained(tmp)
        inst = EcapaEmbedder._instance
        assert inst is not None and inst.tier == "speechbrain"
        assert inst.embed_dim == 24
    finally:
        EcapaEmbedder._instance = saved


def test_generate_streaming_matches_generate(model, rng):
    audio = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    proc = ASRProcessor(
        model.tokenizer, projector=model.projector,
        num_mel_bins=model.config.encoder.num_mel_bins, mel_buckets=(100,),
    )
    feats = proc.extract_features(audio)
    batch_tokens = model.generate(
        feats["input_features"], feats["audio_attention_mask"]
    )[0]
    streamed = "".join(
        model.generate_streaming(feats["input_features"], feats["audio_attention_mask"])
    )
    from tiny_audio_tpu.pipeline import ASRPipeline

    pipe_text = ASRPipeline(model, proc).postprocess_tokens(batch_tokens)
    from tiny_audio_tpu.pipeline import truncate_repetitions

    assert truncate_repetitions(streamed.strip()) == pipe_text


class TestThinkStreamFilter:
    def _run(self, chunks):
        from tiny_audio_tpu.models.asr import filter_think_stream

        return "".join(filter_think_stream(iter(chunks)))

    def test_plain_passthrough(self):
        assert self._run(["hello ", "world"]) == "hello world"

    def test_simple_think_block_stripped(self):
        assert self._run(["a<think>hidden</think>b"]) == "ab"

    def test_split_across_chunks(self):
        assert self._run(["a<thi", "nk>hid", "den</think>", "b"]) == "ab"

    def test_close_then_open_in_one_chunk_does_not_leak(self):
        # regression: while in_think, a chunk '</think>hi <think>' used to
        # yield the buffered think content and a literal '</think>'
        out = self._run(["x<think>abc", "</think>hi <think>more</think>y"])
        assert out == "xhi y"
        assert "</think>" not in out and "abc" not in out

    def test_unclosed_think_suppressed_at_end(self):
        assert self._run(["a<think>never closed"]) == "a"
