"""Offline checkpoint-level dress rehearsal for the reference parity run.

Every module converter has its own torch-oracle test; this test closes the
remaining seam — the FILE-LEVEL contract.  It fabricates a checkpoint in the
reference's exact artifact layout (``config.json`` with nested HF tower
configs + ``model.safetensors`` with ``projector.``-prefixed keys + tower
dirs named by ``audio_model_id``/``text_model_id`` — the layout
``/root/reference/tiny_audio/asr_modeling.py:825-852`` writes and
``:59-131`` reloads), runs ``convert_reference_checkpoint`` on that
directory, and asserts the full pipeline transcript equals a
torch-composed pipeline's transcript token-for-token.  With this green,
the networked run on the published ``mazesmazes/tiny-audio`` weights
(PARITY.md) is pure execution.
"""

import json

import numpy as np
import pytest
import torch

pytestmark = pytest.mark.slow


def _make_wav(seconds: float = 5.0, rate: int = 16000) -> np.ndarray:
    """Deterministic chirp + noise, exactly ``seconds`` long (fills the
    500-frame mel bucket so the encoder mask is all-ones on both sides)."""
    rng = np.random.default_rng(42)
    t = np.arange(int(seconds * rate)) / rate
    wav = 0.3 * np.sin(2 * np.pi * (200 + 300 * t) * t)
    wav += 0.02 * rng.standard_normal(t.shape)
    return wav.astype(np.float32)


@pytest.fixture(scope="module")
def reference_artifact(tmp_path_factory):
    """(ckpt_dir, torch_encoder, torch_lm, torch_projector) in the
    reference's artifact layout, with tiny random towers."""
    from transformers import Qwen3Config, Qwen3ForCausalLM, WhisperConfig, WhisperModel

    root = tmp_path_factory.mktemp("ref_artifact")

    # --- towers, saved as standalone HF checkpoints (the artifact carries
    # only their ids; the reference re-downloads them — asr_modeling.py:203-254)
    torch.manual_seed(0)
    whisper_cfg = WhisperConfig(
        num_mel_bins=80, d_model=64, encoder_layers=2,
        encoder_attention_heads=4, encoder_ffn_dim=128,
        decoder_layers=1, decoder_attention_heads=4, decoder_ffn_dim=128,
        max_source_positions=250,  # HF whisper requires mel == 2*positions
        vocab_size=100, pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=1,
    )
    torch_whisper = WhisperModel(whisper_cfg).eval().float()
    enc_dir = root / "towers" / "whisper-tiny-rehearsal"
    torch_whisper.save_pretrained(enc_dir, safe_serialization=True)

    qwen_cfg = Qwen3Config(
        vocab_size=512, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        intermediate_size=128, rope_theta=1_000_000.0,
        tie_word_embeddings=True, max_position_embeddings=1024,
    )
    torch_lm = Qwen3ForCausalLM(qwen_cfg).eval().float()
    dec_dir = root / "towers" / "qwen3-rehearsal"
    torch_lm.save_pretrained(dec_dir, safe_serialization=True)

    # --- the reference's trained-projector torch module (MLP variant,
    # /root/reference/tiny_audio/projectors.py:23-71 naming contract)
    k, enc_dim, llm_dim = 4, 64, 64

    class RefMLP(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.linear_1 = torch.nn.Linear(enc_dim * k, llm_dim, bias=False)
            self.norm = torch.nn.RMSNorm(llm_dim, eps=1e-6)
            self.linear_2 = torch.nn.Linear(llm_dim, llm_dim, bias=False)
            self.norm_2 = torch.nn.RMSNorm(llm_dim, eps=1e-6)

        def forward(self, x):
            b, t, d = x.shape
            out_len = (t - k) // k + 1
            x = x[:, : out_len * k, :].reshape(b, out_len, d * k)
            x = self.norm(self.linear_1(x))
            x = torch.nn.functional.gelu(x)
            return self.norm_2(self.linear_2(x))

    torch.manual_seed(1)
    projector = RefMLP().eval().float()
    with torch.no_grad():  # non-trivial norms: catch scale-handling bugs
        projector.norm.weight.mul_(1.2)
        projector.norm_2.weight.add_(0.1)

    # --- checkpoint dir in the published layout
    ckpt = root / "checkpoint"
    ckpt.mkdir()
    from safetensors.torch import save_file

    save_file(
        {f"projector.{name}": w.contiguous()
         for name, w in projector.state_dict().items()},
        str(ckpt / "model.safetensors"),
    )
    config = {
        # PretrainedConfig serialization shape (asr_config.py:113-220),
        # incl. the `encoder` alias of audio_config and the HF plumbing keys
        # a real artifact carries
        "model_type": "asr_model",
        "architectures": ["ASRModel"],
        "auto_map": {"AutoConfig": "asr_config.ASRConfig",
                     "AutoModel": "asr_modeling.ASRModel"},
        "custom_pipelines": {"automatic-speech-recognition": {
            "impl": "asr_pipeline.ASRPipeline"}},
        "audio_model_id": str(enc_dir),
        "text_model_id": str(dec_dir),
        "attn_implementation": "sdpa",
        "model_dtype": "float32",
        "encoder_dim": enc_dim,
        "llm_dim": llm_dim,
        "encoder_conv_layers": [[1, 3, 1], [1, 3, 2]],
        "audio_sample_rate": 16000,
        "projector_type": "mlp",
        "projector_pool_stride": k,
        "audio_token_dropout": 0.0,
        "use_lora": False,
        "freeze_language_model": True,
        "max_new_tokens": 16,
        "num_beams": 1,
        "repetition_penalty": 1.0,
        "do_sample": False,
        "audio_config": json.loads(torch_whisper.config.to_json_string()),
        "text_config": json.loads(torch_lm.config.to_json_string()),
        "encoder": json.loads(torch_whisper.config.to_json_string()),
    }
    (ckpt / "config.json").write_text(json.dumps(config, indent=2))
    (ckpt / "preprocessor_config.json").write_text(json.dumps({
        "processor_class": "ASRProcessor",
        "auto_map": {"AutoProcessor": "asr_processing.ASRProcessor"},
        "feature_size": 80, "sampling_rate": 16000,
    }))

    return ckpt, torch_whisper, torch_lm, projector


class TestDressRehearsal:
    def test_transcript_matches_torch_composition(self, reference_artifact):
        ckpt, torch_whisper, torch_lm, projector = reference_artifact

        from tiny_audio_tpu.convert import convert_reference_checkpoint
        from tiny_audio_tpu.pipeline import ASRPipeline

        model = convert_reference_checkpoint(ckpt)
        assert model.config.projector_type == "mlp"
        assert model.config.encoder.num_layers == 2
        assert model.config.decoder.vocab_size == 512
        pipe = ASRPipeline(model)

        wav = _make_wav()
        ours_text = pipe(wav)["text"]

        # ---- torch-composed oracle over the SAME features
        feats = pipe.processor.extract_features([wav])
        mel_np = np.asarray(feats["input_features"], np.float32)
        assert mel_np.shape[-1] == 500  # fills the bucket; mask all-ones
        assert int(np.asarray(feats["audio_attention_mask"]).sum()) == 500

        with torch.no_grad():
            enc_out = torch_whisper.encoder(
                torch.from_numpy(mel_np)
            ).last_hidden_state
            audio_embeds = projector(enc_out)

        n_audio = int(audio_embeds.shape[1])
        assert n_audio == model._num_audio_tokens(500)

        ids = model.build_prompt_ids(n_audio)
        ids_t = torch.tensor([ids], dtype=torch.long)
        with torch.no_grad():
            embeds = torch_lm.get_input_embeddings()(ids_t)
            mask = ids_t == model.tokenizer.audio_token_id
            assert int(mask.sum()) == n_audio
            embeds[mask] = audio_embeds.reshape(-1, audio_embeds.shape[-1])
            out = torch_lm.generate(
                inputs_embeds=embeds,
                attention_mask=torch.ones_like(ids_t),
                max_new_tokens=16, do_sample=False,
                eos_token_id=list(model.tokenizer.eos_token_ids),
                pad_token_id=model.tokenizer.pad_token_id,
            )
        oracle = out[0].numpy()
        if oracle.shape[0] > 16:  # older HF returns prompt+generation
            oracle = oracle[len(ids):]

        # token-for-token: strip pad/eos tails on both sides
        drop = set(model.tokenizer.eos_token_ids) | {model.tokenizer.pad_token_id}
        ours_tokens = model.generate(
            feats["input_features"], feats["audio_attention_mask"],
            mel_length=500,
        )[0]
        ours_seq = [int(t) for t in ours_tokens if int(t) not in drop]
        oracle_seq = [int(t) for t in oracle if int(t) not in drop]
        assert ours_seq == oracle_seq, (
            f"token divergence: ours={ours_seq} oracle={oracle_seq}"
        )

        oracle_text = pipe.postprocess_tokens(oracle)
        assert ours_text == oracle_text

    def test_roundtrip_through_our_artifact(self, reference_artifact):
        """convert -> save_pretrained -> from_pretrained keeps the
        transcript identical (our own artifact layer adds no drift)."""
        ckpt, *_ = reference_artifact

        from tiny_audio_tpu.convert import convert_reference_checkpoint
        from tiny_audio_tpu.models.asr import ASRModel
        from tiny_audio_tpu.pipeline import ASRPipeline

        wav = _make_wav()
        model = convert_reference_checkpoint(ckpt)
        before = ASRPipeline(model)(wav)["text"]

        out_dir = ckpt.parent / "converted"
        model.save_pretrained(out_dir)
        reloaded = ASRModel.from_pretrained(out_dir)
        after = ASRPipeline(reloaded)(wav)["text"]
        assert before == after
