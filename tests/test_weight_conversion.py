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
            convert_reference_projector({}, "qformer")


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
