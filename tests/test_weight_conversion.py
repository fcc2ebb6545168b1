"""Weight-conversion parity: HF torch modules as numerical oracles.

The strongest offline parity check (SURVEY.md §7 "frozen-tower weight
conversion" hard part): instantiate tiny RANDOM HF torch models from configs
(no downloads), convert their weights, and require our flax modules to
reproduce the torch forward numerically in fp32.
"""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tiny_audio_tpu.config import DecoderConfig, EncoderConfig, tiny_test_config


@pytest.mark.slow
class TestWhisperEncoderParity:
    @pytest.fixture(scope="class")
    def pair(self):
        from transformers import WhisperConfig, WhisperModel

        hf_cfg = WhisperConfig(
            num_mel_bins=80, d_model=64, encoder_layers=2,
            encoder_attention_heads=4, encoder_ffn_dim=128,
            decoder_layers=1, decoder_attention_heads=4, decoder_ffn_dim=128,
            max_source_positions=256,
            vocab_size=100, pad_token_id=0, bos_token_id=1, eos_token_id=2,
            decoder_start_token_id=1,
        )
        torch_model = WhisperModel(hf_cfg).encoder.eval().float()
        cfg = EncoderConfig(
            num_mel_bins=80, d_model=64, num_layers=2, num_heads=4,
            ffn_dim=128, max_source_positions=256,
        )
        from tiny_audio_tpu.models.encoder import (
            AudioEncoder,
            convert_hf_whisper_encoder,
        )

        params = convert_hf_whisper_encoder(
            torch_model.state_dict(), cfg, dtype=jnp.float32
        )
        flax_model = AudioEncoder(cfg, dtype=jnp.float32, param_dtype=jnp.float32)
        return torch_model, flax_model, params

    def test_forward_parity(self, pair):
        torch_model, flax_model, params = pair
        rng = np.random.default_rng(0)
        mel = rng.standard_normal((2, 80, 512)).astype(np.float32)
        with torch.no_grad():
            expected = torch_model(torch.from_numpy(mel)).last_hidden_state.numpy()
        got = np.asarray(flax_model.apply({"params": params}, jnp.asarray(mel)))
        assert got.shape == expected.shape
        np.testing.assert_allclose(got, expected, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
class TestQwen3Parity:
    @pytest.fixture(scope="class")
    def pair(self):
        from transformers import Qwen3Config, Qwen3ForCausalLM

        hf_cfg = Qwen3Config(
            vocab_size=128, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16,
            intermediate_size=96, rope_theta=1_000_000.0,
            tie_word_embeddings=True, max_position_embeddings=512,
        )
        torch_model = Qwen3ForCausalLM(hf_cfg).eval().float()
        cfg = DecoderConfig(
            vocab_size=128, hidden_size=64, num_layers=2, num_heads=4,
            num_kv_heads=2, head_dim=16, intermediate_size=96,
            rope_theta=1_000_000.0, tie_word_embeddings=True,
        )
        from tiny_audio_tpu.models.decoder import Qwen3Decoder, convert_hf_qwen3

        params = convert_hf_qwen3(
            torch_model.state_dict(), cfg, dtype=jnp.float32
        )
        flax_model = Qwen3Decoder(cfg, dtype=jnp.float32, param_dtype=jnp.float32)
        return torch_model, flax_model, params

    def test_logits_parity(self, pair):
        torch_model, flax_model, params = pair
        rng = np.random.default_rng(0)
        ids = rng.integers(0, 128, (2, 12)).astype(np.int32)
        with torch.no_grad():
            expected = torch_model(torch.from_numpy(ids).long()).logits.numpy()
        embeds = flax_model.apply(
            {"params": params}, jnp.asarray(ids), method=flax_model.embed
        )
        positions = jnp.broadcast_to(jnp.arange(12), (2, 12))
        got, _ = flax_model.apply(
            {"params": params}, embeds, positions,
            padding_mask=jnp.ones((2, 12), jnp.int32),
        )
        got = np.asarray(got)
        np.testing.assert_allclose(got, expected, atol=3e-4, rtol=1e-3)

    def test_greedy_decode_parity(self, pair):
        """Greedy continuation matches HF generate for 8 tokens."""
        torch_model, flax_model, params = pair
        rng = np.random.default_rng(1)
        ids = rng.integers(0, 128, (1, 6)).astype(np.int32)
        with torch.no_grad():
            hf_out = torch_model.generate(
                torch.from_numpy(ids).long(), max_new_tokens=8, do_sample=False,
                pad_token_id=0,
            ).numpy()[0, 6:]

        from tiny_audio_tpu.generation import GenerationConfig, generate_tokens

        embeds = flax_model.apply(
            {"params": params}, jnp.asarray(ids), method=flax_model.embed
        )
        gen = GenerationConfig(max_new_tokens=8, eos_token_ids=(), pad_token_id=0)
        tokens, _ = generate_tokens(
            flax_model, {"params": params}, embeds, jnp.asarray(ids), gen
        )
        np.testing.assert_array_equal(np.asarray(tokens)[0], hf_out)


class TestLlamaFamilyParity:
    """The reference accepts ANY AutoModelForCausalLM text tower
    (asr_modeling.py:239-254); qk_norm=False selects the Llama/SmolLM2
    layout here.  Oracle: HF torch LlamaForCausalLM, tiny random weights."""

    @pytest.fixture(scope="class")
    def pair(self):
        from transformers import LlamaConfig, LlamaForCausalLM

        hf_cfg = LlamaConfig(
            vocab_size=128, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            intermediate_size=96, rope_theta=10_000.0,
            tie_word_embeddings=True, max_position_embeddings=512,
            attention_bias=False, mlp_bias=False,
        )
        torch_model = LlamaForCausalLM(hf_cfg).eval().float()
        from tiny_audio_tpu.config import DecoderConfig as DC

        cfg = DC.from_hf_config(hf_cfg.to_dict())
        assert cfg.qk_norm is False and cfg.head_dim == 16
        from tiny_audio_tpu.models.decoder import Qwen3Decoder, convert_hf_qwen3

        params = convert_hf_qwen3(
            torch_model.state_dict(), cfg, dtype=jnp.float32
        )
        assert "q_norm" not in params["layers"]
        flax_model = Qwen3Decoder(cfg, dtype=jnp.float32, param_dtype=jnp.float32)
        return torch_model, flax_model, params

    def test_logits_parity(self, pair):
        torch_model, flax_model, params = pair
        rng = np.random.default_rng(0)
        ids = rng.integers(0, 128, (2, 12)).astype(np.int32)
        with torch.no_grad():
            expected = torch_model(torch.from_numpy(ids).long()).logits.numpy()
        embeds = flax_model.apply(
            {"params": params}, jnp.asarray(ids), method=flax_model.embed
        )
        positions = jnp.broadcast_to(jnp.arange(12), (2, 12))
        got, _ = flax_model.apply(
            {"params": params}, embeds, positions,
            padding_mask=jnp.ones((2, 12), jnp.int32),
        )
        np.testing.assert_allclose(np.asarray(got), expected, atol=3e-4,
                                   rtol=1e-3)

    def test_greedy_decode_parity(self, pair):
        torch_model, flax_model, params = pair
        rng = np.random.default_rng(1)
        ids = rng.integers(0, 128, (1, 6)).astype(np.int32)
        with torch.no_grad():
            hf_out = torch_model.generate(
                torch.from_numpy(ids).long(), max_new_tokens=8,
                do_sample=False, pad_token_id=0,
            ).numpy()[0, 6:]

        from tiny_audio_tpu.generation import GenerationConfig, generate_tokens

        embeds = flax_model.apply(
            {"params": params}, jnp.asarray(ids), method=flax_model.embed
        )
        gen = GenerationConfig(max_new_tokens=8, eos_token_ids=(), pad_token_id=0)
        tokens, _ = generate_tokens(
            flax_model, {"params": params}, embeds, jnp.asarray(ids), gen
        )
        np.testing.assert_array_equal(np.asarray(tokens)[0], hf_out)


class TestGemmaFamilyParity:
    """Gemma-v1 text tower: zero-centered (1+w) RMSNorm, GeGLU with the
    tanh-approximated GELU, sqrt(hidden) embedding normalizer, head_dim
    decoupled from hidden/num_heads, always-tied embeddings.  Oracle: HF
    torch GemmaForCausalLM, tiny random weights.  (Gemma-2/3 are refused
    by decoder_kwargs_from_hf — soft-capping/sliding-window unsupported.)"""

    @pytest.fixture(scope="class")
    def pair(self):
        from transformers import GemmaConfig, GemmaForCausalLM

        hf_cfg = GemmaConfig(
            vocab_size=128, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=32,
            intermediate_size=96, rope_theta=10_000.0,
            max_position_embeddings=512, attention_bias=False,
        )
        torch_model = GemmaForCausalLM(hf_cfg).eval().float()
        # random norm weights: the zeros init would make (1+w) == llama's
        # ones init and hide an offset-convention bug
        with torch.no_grad():
            for name, p in torch_model.named_parameters():
                if "norm" in name:
                    p.normal_(0.0, 0.5)
        from tiny_audio_tpu.config import DecoderConfig as DC

        cfg = DC.from_hf_config(hf_cfg.to_dict())
        assert cfg.qk_norm is False and cfg.head_dim == 32
        assert cfg.rms_norm_offset and cfg.embedding_normalizer
        assert cfg.hidden_activation == "gelu_tanh"
        from tiny_audio_tpu.models.decoder import Qwen3Decoder, convert_hf_qwen3

        params = convert_hf_qwen3(
            torch_model.state_dict(), cfg, dtype=jnp.float32
        )
        flax_model = Qwen3Decoder(cfg, dtype=jnp.float32, param_dtype=jnp.float32)
        return torch_model, flax_model, params

    def test_gemma23_refused(self):
        from tiny_audio_tpu.config import decoder_kwargs_from_hf

        for mt in ("gemma2", "gemma3_text"):
            with pytest.raises(ValueError, match="not supported"):
                decoder_kwargs_from_hf({"model_type": mt, "hidden_size": 64})

    def test_logits_parity(self, pair):
        torch_model, flax_model, params = pair
        rng = np.random.default_rng(0)
        ids = rng.integers(0, 128, (2, 12)).astype(np.int32)
        with torch.no_grad():
            expected = torch_model(torch.from_numpy(ids).long()).logits.numpy()
        embeds = flax_model.apply(
            {"params": params}, jnp.asarray(ids), method=flax_model.embed
        )
        positions = jnp.broadcast_to(jnp.arange(12), (2, 12))
        got, _ = flax_model.apply(
            {"params": params}, embeds, positions,
            padding_mask=jnp.ones((2, 12), jnp.int32),
        )
        np.testing.assert_allclose(np.asarray(got), expected, atol=3e-4,
                                   rtol=1e-3)

    def test_greedy_decode_parity(self, pair):
        """Greedy continuation (KV-cached decode loop) matches HF generate."""
        torch_model, flax_model, params = pair
        rng = np.random.default_rng(1)
        ids = rng.integers(0, 128, (1, 6)).astype(np.int32)
        with torch.no_grad():
            hf_out = torch_model.generate(
                torch.from_numpy(ids).long(), max_new_tokens=8,
                do_sample=False, pad_token_id=0,
            ).numpy()[0, 6:]

        from tiny_audio_tpu.generation import GenerationConfig, generate_tokens

        embeds = flax_model.apply(
            {"params": params}, jnp.asarray(ids), method=flax_model.embed
        )
        gen = GenerationConfig(max_new_tokens=8, eos_token_ids=(), pad_token_id=0)
        tokens, _ = generate_tokens(
            flax_model, {"params": params}, embeds, jnp.asarray(ids), gen
        )
        np.testing.assert_array_equal(np.asarray(tokens)[0], hf_out)


@pytest.mark.slow
class TestWav2Vec2Parity:
    def test_emissions_parity(self):
        """Full BASE_960H-shaped random model (our module pins that
        architecture, matching torchaudio's bundle)."""
        from transformers import Wav2Vec2Config, Wav2Vec2ForCTC

        hf_cfg = Wav2Vec2Config(
            vocab_size=29,
            do_stable_layer_norm=False, feat_extract_norm="group",
        )
        torch_model = Wav2Vec2ForCTC(hf_cfg).eval().float()

        from tiny_audio_tpu.models.wav2vec2 import Wav2Vec2CTC, convert_hf_wav2vec2

        flax_model = Wav2Vec2CTC()
        params = convert_hf_wav2vec2(torch_model.state_dict())
        rng = np.random.default_rng(0)
        wav = (0.1 * rng.standard_normal((1, 3200))).astype(np.float32)
        with torch.no_grad():
            expected = torch.log_softmax(
                torch_model(torch.from_numpy(wav)).logits, dim=-1
            ).numpy()
        got = np.asarray(flax_model.apply({"params": params}, jnp.asarray(wav)))
        assert got.shape == expected.shape
        np.testing.assert_allclose(got, expected, atol=5e-4, rtol=1e-3)


class TestReferenceProjectorConversion:
    def test_mlp_roundtrip_numerics(self):
        """Build the reference's torch MLP projector shape-alike, convert,
        compare forwards."""
        import torch.nn as tnn

        cfg = tiny_test_config(model_dtype="float32")
        k = cfg.projector_pool_stride
        in_dim = cfg.encoder_dim * k
        hidden = cfg.projector_hidden_dim or cfg.llm_dim

        class RefMLP(tnn.Module):
            def __init__(self):
                super().__init__()
                self.linear_1 = tnn.Linear(in_dim, hidden, bias=False)
                self.norm = tnn.RMSNorm(hidden, eps=1e-6)
                self.linear_2 = tnn.Linear(hidden, cfg.llm_dim, bias=False)
                self.norm_2 = tnn.RMSNorm(cfg.llm_dim, eps=1e-6)

            def forward(self, x):
                b, t, d = x.shape
                out_len = (t - k) // k + 1
                x = x[:, : out_len * k, :].reshape(b, out_len, d * k)
                x = self.linear_1(x)
                x = self.norm(x)
                x = tnn.functional.gelu(x)
                x = self.linear_2(x)
                return self.norm_2(x)

        torch.manual_seed(0)
        ref = RefMLP().eval().float()
        # non-trivial norm weights
        with torch.no_grad():
            ref.norm.weight.mul_(1.3)
            ref.norm_2.weight.add_(0.1)

        from tiny_audio_tpu.convert import convert_reference_projector
        from tiny_audio_tpu.models.projectors import MLPProjector

        sd = {f"projector.{k2}": v for k2, v in ref.state_dict().items()}
        params = convert_reference_projector(sd, "mlp")
        proj = MLPProjector(cfg, dtype=jnp.float32, param_dtype=jnp.float32)

        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 33, cfg.encoder_dim)).astype(np.float32)
        with torch.no_grad():
            expected = ref(torch.from_numpy(x)).numpy()
        got, aux = proj.apply({"params": params}, jnp.asarray(x), train=False)
        np.testing.assert_allclose(np.asarray(got), expected, atol=2e-4, rtol=1e-3)

    def test_unknown_type_raises(self):
        from tiny_audio_tpu.convert import convert_reference_projector

        with pytest.raises(ValueError):
            convert_reference_projector({}, "bogus")

    def test_qformer_blip2_parity(self):
        """Reference QFormer = Blip2QFormerModel + query/encoder_proj/linear
        (``/root/reference/tiny_audio/projectors.py:359-475``): build the same
        torch composite from HF parts, convert, compare forwards."""
        import math

        from transformers import Blip2QFormerConfig, Blip2QFormerModel

        cfg = tiny_test_config(
            model_dtype="float32", projector_type="qformer",
            qformer_hidden_size=32, qformer_num_layers=2, qformer_num_heads=4,
            qformer_intermediate_size=64, qformer_window_size=15,
            downsample_rate=5,
        )
        hidden, window, nq = 32, 15, 3
        qcfg = Blip2QFormerConfig(
            hidden_size=hidden, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, encoder_hidden_size=hidden,
            cross_attention_frequency=1, hidden_act="gelu",
            attention_probs_dropout_prob=0.1, hidden_dropout_prob=0.1,
            layer_norm_eps=1e-12, initializer_range=0.02,
        )
        torch.manual_seed(0)
        qf = Blip2QFormerModel(qcfg).eval().float()
        query = torch.randn(1, nq, hidden)
        encoder_proj = torch.nn.Linear(cfg.encoder_dim, hidden, bias=False)
        linear = torch.nn.Linear(hidden, cfg.llm_dim)

        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 40, cfg.encoder_dim)).astype(np.float32)
        with torch.no_grad():
            h = encoder_proj(torch.from_numpy(x))
            b, t, _ = h.shape
            nblocks = math.ceil(t / window)
            h = torch.nn.functional.pad(h, (0, 0, 0, nblocks * window - t))
            h = h.reshape(b * nblocks, window, hidden)
            out = qf(
                query_embeds=query.expand(b * nblocks, -1, -1),
                encoder_hidden_states=h, return_dict=True,
            ).last_hidden_state
            expected = linear(out.reshape(b, nblocks * nq, hidden)).numpy()

        sd = {"query": query.numpy()}
        sd.update({f"encoder_proj.{k}": v for k, v in encoder_proj.state_dict().items()})
        sd.update({f"linear.{k}": v for k, v in linear.state_dict().items()})
        sd.update({f"qformer.{k}": v for k, v in qf.state_dict().items()})

        from tiny_audio_tpu.convert import convert_reference_projector
        from tiny_audio_tpu.models.projectors import QFormerProjector

        params = convert_reference_projector(sd, "qformer")
        proj = QFormerProjector(cfg, dtype=jnp.float32, param_dtype=jnp.float32)
        got, _ = proj.apply({"params": params}, jnp.asarray(x), train=False)
        assert got.shape == expected.shape
        np.testing.assert_allclose(np.asarray(got), expected, atol=3e-4, rtol=1e-3)


@pytest.mark.slow
class TestGlmEncoderConversion:
    """Three-branch encoder loading parity (reference
    ``/root/reference/tiny_audio/asr_modeling.py:203-237``): GLM-style full
    checkpoints carry the tower under ``audio_tower.*``; LM keys are dropped."""

    @pytest.fixture(scope="class")
    def whisper_pair(self):
        from transformers import WhisperConfig, WhisperModel

        hf_cfg = WhisperConfig(
            num_mel_bins=80, d_model=64, encoder_layers=2,
            encoder_attention_heads=4, encoder_ffn_dim=128,
            decoder_layers=1, decoder_attention_heads=4, decoder_ffn_dim=128,
            max_source_positions=256,
            vocab_size=100, pad_token_id=0, bos_token_id=1, eos_token_id=2,
            decoder_start_token_id=1,
        )
        torch.manual_seed(0)
        encoder = WhisperModel(hf_cfg).encoder.eval().float()
        cfg = EncoderConfig(
            num_mel_bins=80, d_model=64, num_layers=2, num_heads=4,
            ffn_dim=128, max_source_positions=256,
        )
        return encoder, cfg

    def _convert_and_run(self, sd, cfg, mel):
        from tiny_audio_tpu.models.encoder import AudioEncoder, convert_hf_audio_encoder

        params = convert_hf_audio_encoder(sd, cfg, dtype=jnp.float32)
        model = AudioEncoder(cfg, dtype=jnp.float32, param_dtype=jnp.float32)
        return np.asarray(model.apply({"params": params}, jnp.asarray(mel)))

    def test_audio_tower_prefix_and_lm_drop(self, whisper_pair):
        encoder, cfg = whisper_pair
        rng = np.random.default_rng(0)
        mel = rng.standard_normal((1, 80, 512)).astype(np.float32)
        with torch.no_grad():
            expected = encoder(torch.from_numpy(mel)).last_hidden_state.numpy()

        # GLM-style full-model dict: tower under audio_tower.*, plus LM /
        # projector keys that the converter must drop.
        sd = {f"audio_tower.{k}": v for k, v in encoder.state_dict().items()}
        sd["language_model.model.embed_tokens.weight"] = torch.zeros(4, 4)
        sd["multi_modal_projector.linear.weight"] = torch.zeros(4, 4)
        got = self._convert_and_run(sd, cfg, mel)
        np.testing.assert_allclose(got, expected, atol=2e-4, rtol=1e-3)

    def test_alias_naming_normalized(self, whisper_pair):
        """GLM/LLM-style renames (o_proj, input_layernorm, mlp.fc1...) land on
        the same params as whisper naming."""
        encoder, cfg = whisper_pair
        renames = [
            (".self_attn.out_proj.", ".self_attn.o_proj."),
            (".self_attn_layer_norm.", ".input_layernorm."),
            (".final_layer_norm.", ".post_attention_layernorm."),
            (".fc1.", ".mlp.fc1."),
            (".fc2.", ".mlp.fc2."),
        ]
        sd = {}
        for k, v in encoder.state_dict().items():
            for new, old in renames:
                k = k.replace(new, old)
            sd[f"audio_tower.{k}"] = v
        rng = np.random.default_rng(1)
        mel = rng.standard_normal((1, 80, 512)).astype(np.float32)
        with torch.no_grad():
            expected = encoder(torch.from_numpy(mel)).last_hidden_state.numpy()
        got = self._convert_and_run(sd, cfg, mel)
        np.testing.assert_allclose(got, expected, atol=2e-4, rtol=1e-3)

    def test_conv_list_naming(self, whisper_pair):
        """conv stacks exported as list modules (conv_layers.{i}.*) map to
        conv{i+1}."""
        encoder, cfg = whisper_pair
        sd = {}
        for k, v in encoder.state_dict().items():
            if k.startswith("conv1."):
                k = "conv_layers.0." + k[len("conv1."):]
            elif k.startswith("conv2."):
                k = "conv_layers.1." + k[len("conv2."):]
            sd[f"audio_tower.{k}"] = v
        rng = np.random.default_rng(2)
        mel = rng.standard_normal((1, 80, 512)).astype(np.float32)
        with torch.no_grad():
            expected = encoder(torch.from_numpy(mel)).last_hidden_state.numpy()
        got = self._convert_and_run(sd, cfg, mel)
        np.testing.assert_allclose(got, expected, atol=2e-4, rtol=1e-3)

    def test_unrecognized_layout_raises(self):
        from tiny_audio_tpu.models.encoder import convert_hf_audio_encoder

        cfg = EncoderConfig(num_mel_bins=80, d_model=64, num_layers=2,
                            num_heads=4, ffn_dim=128, max_source_positions=256)
        with pytest.raises(KeyError, match="unrecognized"):
            convert_hf_audio_encoder(
                {"audio_tower.something.weird": np.zeros((2, 2), np.float32)},
                cfg, dtype=jnp.float32,
            )

    def test_encoder_config_from_hf(self):
        whisper_json = {
            "num_mel_bins": 80, "d_model": 64, "encoder_layers": 2,
            "encoder_attention_heads": 4, "encoder_ffn_dim": 128,
            "max_source_positions": 256,
        }
        cfg = EncoderConfig.from_hf_config(whisper_json)
        assert (cfg.d_model, cfg.num_layers, cfg.ffn_dim) == (64, 2, 128)
        glm_json = {"audio_config": dict(whisper_json, d_model=96)}
        cfg2 = EncoderConfig.from_hf_config(glm_json)
        assert cfg2.d_model == 96 and cfg2.num_mel_bins == 80


class TestLoadStateDict:
    def test_safetensors_roundtrip(self, tmp_path):
        from safetensors.numpy import save_file

        from tiny_audio_tpu.convert import load_state_dict

        save_file({"a": np.ones((2, 2), np.float32)}, str(tmp_path / "m.safetensors"))
        sd = load_state_dict(tmp_path)
        assert "a" in sd and sd["a"].shape == (2, 2)

    def test_missing_raises(self, tmp_path):
        from tiny_audio_tpu.convert import load_state_dict

        with pytest.raises(FileNotFoundError):
            load_state_dict(tmp_path)
