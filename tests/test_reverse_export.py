"""Reverse interop: export a model trained HERE back to the reference's
HF artifact layout, and prove a torch consumer reproduces our transcripts.

Two tiers (VERDICT r3 next-round #4):

- **Roundtrip identities** — ``export_*`` is the exact inverse of the
  ``convert_*`` importers for every projector family and the decoder, so
  export -> convert returns the identical param tree (fp32 bit-exact).
- **Reversed dress rehearsal** — fabricate tiny HF torch towers, import
  them, TRAIN the projector a few real Trainer steps (a genuinely
  TPU-trained projector), export the reference-layout artifact, then
  compose the torch oracle from the artifact's files alone
  (``model.safetensors`` + ``config.json`` + tower ids) and assert the
  torch transcript equals ours token-for-token — the mirror image of
  ``tests/test_checkpoint_dress_rehearsal.py``.

Reference contract: ``/root/reference/tiny_audio/asr_modeling.py:397-421``
(state_dict naming), ``:825-852`` (artifact layout),
``/root/reference/scripts/hub/push.py:18-110``.
"""

import json

import jax
import numpy as np
import pytest

from tiny_audio_tpu.config import tiny_test_config
from tiny_audio_tpu.export import (
    export_decoder_state,
    export_lora_adapter,
    export_projector_state,
    export_reference_artifact,
    export_reference_config,
)
from tiny_audio_tpu.models.asr import ASRModel


def _assert_trees_equal(ours, reimported, path=""):
    if isinstance(ours, dict):
        assert set(ours) == set(reimported), (
            f"{path}: keys {sorted(ours)} != {sorted(reimported)}"
        )
        for k in ours:
            _assert_trees_equal(ours[k], reimported[k], f"{path}/{k}")
    else:
        np.testing.assert_array_equal(
            np.asarray(ours, np.float32), np.asarray(reimported, np.float32),
            err_msg=path,
        )


class TestRoundtripIdentity:
    @pytest.mark.parametrize("ptype", ["mlp", "mosa", "moe", "qformer"])
    def test_projector_roundtrip(self, ptype):
        from tiny_audio_tpu.convert import convert_reference_projector

        model = ASRModel(
            tiny_test_config(projector_type=ptype, model_dtype="float32"), seed=3
        )
        ours = jax.device_get(model.params["projector"])
        sd = export_projector_state(ours, ptype)
        # the artifact carries the projector. prefix; the importer strips it
        sd = {f"projector.{k}": v for k, v in sd.items()}
        back = jax.device_get(convert_reference_projector(sd, ptype))
        _assert_trees_equal(ours, back)

    def test_decoder_roundtrip(self):
        from tiny_audio_tpu.models.decoder import convert_hf_qwen3

        cfg = tiny_test_config(model_dtype="float32")
        model = ASRModel(cfg, seed=4)
        ours = jax.device_get(model.params["decoder"])
        sd = export_decoder_state(ours, cfg.decoder)
        back = jax.device_get(convert_hf_qwen3(sd, cfg.decoder, dtype=np.float32))
        _assert_trees_equal(ours, back)

    def test_config_roundtrip(self, tmp_path):
        from tiny_audio_tpu.convert import config_from_reference_dir

        cfg = tiny_test_config(model_dtype="float32", projector_type="moe")
        (tmp_path / "config.json").write_text(
            json.dumps(export_reference_config(cfg))
        )
        back = config_from_reference_dir(tmp_path)
        assert back.projector_type == "moe"
        assert back.encoder.num_layers == cfg.encoder.num_layers
        assert back.encoder.d_model == cfg.encoder.d_model
        assert back.decoder.vocab_size == cfg.decoder.vocab_size
        assert back.decoder.num_kv_heads == cfg.decoder.num_kv_heads
        assert back.decoder.qk_norm == cfg.decoder.qk_norm
        assert back.encoder_conv_layers == cfg.encoder_conv_layers
        assert back.projector_pool_stride == cfg.projector_pool_stride

    def test_lora_adapter_peft_layout(self):
        cfg = tiny_test_config(
            model_dtype="float32", use_lora=True, lora_rank=4, lora_alpha=8
        )
        model = ASRModel(cfg, seed=5)
        sd, adapter_cfg = export_lora_adapter(model.params["decoder"], cfg)
        assert adapter_cfg["peft_type"] == "LORA" and adapter_cfg["r"] == 4
        n_layers = cfg.decoder.num_layers
        assert len(sd) == 2 * n_layers * len(adapter_cfg["target_modules"])
        a = sd["base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight"]
        b = sd["base_model.model.model.layers.0.self_attn.q_proj.lora_B.weight"]
        # torch Linear convention: A [r, in], B [out, r]
        assert a.shape == (4, cfg.decoder.hidden_size)
        assert b.shape == (cfg.decoder.num_heads * cfg.decoder.head_dim, 4)


@pytest.mark.slow
class TestReversedDressRehearsal:
    @pytest.fixture(scope="class")
    def towers(self, tmp_path_factory):
        """Tiny HF torch towers saved as standalone checkpoints."""
        import torch
        from transformers import (
            Qwen3Config,
            Qwen3ForCausalLM,
            WhisperConfig,
            WhisperModel,
        )

        root = tmp_path_factory.mktemp("rev_towers")
        torch.manual_seed(0)
        whisper_cfg = WhisperConfig(
            num_mel_bins=80, d_model=64, encoder_layers=2,
            encoder_attention_heads=4, encoder_ffn_dim=128,
            decoder_layers=1, decoder_attention_heads=4, decoder_ffn_dim=128,
            max_source_positions=250,
            vocab_size=100, pad_token_id=0, bos_token_id=1, eos_token_id=2,
            decoder_start_token_id=1,
        )
        torch_whisper = WhisperModel(whisper_cfg).eval().float()
        enc_dir = root / "whisper-rev"
        torch_whisper.save_pretrained(enc_dir, safe_serialization=True)

        qwen_cfg = Qwen3Config(
            vocab_size=512, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16,
            intermediate_size=128, rope_theta=1_000_000.0,
            tie_word_embeddings=True, max_position_embeddings=1024,
        )
        torch_lm = Qwen3ForCausalLM(qwen_cfg).eval().float()
        dec_dir = root / "qwen3-rev"
        torch_lm.save_pretrained(dec_dir, safe_serialization=True)
        return enc_dir, dec_dir, torch_whisper, torch_lm

    def _our_trained_model(self, towers):
        """Import the torch towers, then genuinely TRAIN the projector for a
        few steps through the real Trainer (stage-1 recipe)."""
        from tiny_audio_tpu.convert import convert_checkpoint
        from tiny_audio_tpu.train.collator import DataCollator
        from tiny_audio_tpu.train.data import synthetic_dataset
        from tiny_audio_tpu.train.optim import OptimizerConfig
        from tiny_audio_tpu.train.trainer import Trainer, TrainingConfig

        enc_dir, dec_dir, *_ = towers
        cfg = tiny_test_config(model_dtype="float32")
        cfg.audio_model_id = str(enc_dir)
        cfg.text_model_id = str(dec_dir)
        cfg.encoder_conv_layers = [(1, 3, 1), (1, 3, 2)]
        cfg.max_new_tokens = 16
        cfg.__post_init__()
        model = convert_checkpoint(
            cfg, encoder_path=enc_dir, decoder_path=dec_dir, seed=0
        )

        import tempfile

        with tempfile.TemporaryDirectory() as run_dir:
            trainer = Trainer(
                model,
                TrainingConfig(
                    output_dir=run_dir, max_steps=2, per_device_batch_size=1,
                    logging_steps=1, save_steps=2, eval_steps=0,
                    dataloader_workers=0,
                    optimizer=OptimizerConfig(
                        total_steps=2, warmup_steps=0,
                        lr_scheduler_type="constant",
                    ),
                ),
                synthetic_dataset(8, seed=0, min_s=0.3, max_s=0.6),
                DataCollator(
                    model.tokenizer, model.projector,
                    num_mel_bins=cfg.encoder.num_mel_bins,
                ),
            )
            trainer.train()
        model.params = jax.device_get(model.params)
        return model

    def test_torch_consumer_matches_ours(self, towers, tmp_path):
        import torch

        enc_dir, dec_dir, torch_whisper, torch_lm = towers
        model = self._our_trained_model(towers)

        out = export_reference_artifact(model, tmp_path / "artifact")
        assert (out / "model.safetensors").exists()
        assert (out / "config.json").exists()
        assert (out / "preprocessor_config.json").exists()

        # ---- torch consumer: artifact files + tower ids ONLY
        art_cfg = json.loads((out / "config.json").read_text())
        assert art_cfg["auto_map"]["AutoModel"] == "asr_modeling.ASRModel"
        assert art_cfg["audio_model_id"] == str(enc_dir)
        k = art_cfg["projector_pool_stride"]

        from safetensors.torch import load_file

        sd = load_file(str(out / "model.safetensors"))
        assert all(key.startswith("projector.") for key in sd)

        enc_dim, llm_dim = art_cfg["encoder_dim"], art_cfg["llm_dim"]

        class RefMLP(torch.nn.Module):  # reference projectors.py:23-71 naming
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

        projector = RefMLP().eval().float()
        missing, unexpected = projector.load_state_dict(
            {key.removeprefix("projector."): v for key, v in sd.items()}
        )
        assert not missing and not unexpected

        # ---- same features through both stacks
        from tiny_audio_tpu.pipeline import ASRPipeline

        rng = np.random.default_rng(7)
        t = np.arange(5 * 16000) / 16000
        wav = (0.3 * np.sin(2 * np.pi * (180 + 250 * t) * t)
               + 0.02 * rng.standard_normal(t.shape)).astype(np.float32)
        pipe = ASRPipeline(model)
        feats = pipe.processor.extract_features([wav])
        mel_np = np.asarray(feats["input_features"], np.float32)

        with torch.no_grad():
            enc_out = torch_whisper.encoder(
                torch.from_numpy(mel_np)
            ).last_hidden_state
            audio_embeds = projector(enc_out)

        n_audio = int(audio_embeds.shape[1])
        assert n_audio == model._num_audio_tokens(int(mel_np.shape[-1]))

        ids = model.build_prompt_ids(n_audio)
        ids_t = torch.tensor([ids], dtype=torch.long)
        with torch.no_grad():
            embeds = torch_lm.get_input_embeddings()(ids_t)
            mask = ids_t == model.tokenizer.audio_token_id
            embeds[mask] = audio_embeds.reshape(-1, audio_embeds.shape[-1])
            gen = torch_lm.generate(
                inputs_embeds=embeds,
                attention_mask=torch.ones_like(ids_t),
                max_new_tokens=16, do_sample=False,
                eos_token_id=list(model.tokenizer.eos_token_ids),
                pad_token_id=model.tokenizer.pad_token_id,
            )
        oracle = gen[0].numpy()
        if oracle.shape[0] > 16:
            oracle = oracle[len(ids):]

        ours = model.generate(
            feats["input_features"], feats["audio_attention_mask"],
            mel_length=int(mel_np.shape[-1]),
        )[0]
        drop = set(model.tokenizer.eos_token_ids) | {model.tokenizer.pad_token_id}
        ours_seq = [int(x) for x in ours if int(x) not in drop]
        oracle_seq = [int(x) for x in oracle if int(x) not in drop]
        assert ours_seq == oracle_seq, (
            f"reverse-export divergence: ours={ours_seq} oracle={oracle_seq}"
        )

    def test_lora_merged_oracle(self, towers, tmp_path):
        """Export a LoRA model; a torch consumer that merges the exported
        PEFT adapters into the exported base reproduces our transcript."""
        import torch

        enc_dir, dec_dir, torch_whisper, _ = towers

        from tiny_audio_tpu.convert import convert_checkpoint

        cfg = tiny_test_config(
            model_dtype="float32", use_lora=True, lora_rank=4, lora_alpha=8,
        )
        cfg.audio_model_id = str(enc_dir)
        cfg.text_model_id = str(dec_dir)
        cfg.encoder_conv_layers = [(1, 3, 1), (1, 3, 2)]
        cfg.max_new_tokens = 12
        cfg.__post_init__()
        model = convert_checkpoint(
            cfg, encoder_path=enc_dir, decoder_path=dec_dir, seed=0
        )
        # non-trivial adapters: lora_b init is zeros -> deltas would vanish
        rng = np.random.default_rng(11)
        layers = model.params["decoder"]["layers"]
        for key in list(layers):
            if key.endswith("_lora_b"):
                layers[key] = 0.05 * rng.standard_normal(
                    np.shape(layers[key])
                ).astype(np.float32)

        out = export_reference_artifact(model, tmp_path / "lora_artifact")
        assert (out / "adapter_model.safetensors").exists()
        adapter_cfg = json.loads((out / "adapter_config.json").read_text())
        scale = adapter_cfg["lora_alpha"] / adapter_cfg["r"]

        from safetensors.torch import load_file
        from transformers import Qwen3ForCausalLM

        torch_lm = Qwen3ForCausalLM.from_pretrained(dec_dir).eval().float()
        adapters = load_file(str(out / "adapter_model.safetensors"))
        with torch.no_grad():
            lm_sd = torch_lm.state_dict()
            for key, a in adapters.items():
                if ".lora_A." not in key:
                    continue
                b = adapters[key.replace(".lora_A.", ".lora_B.")]
                base_key = (
                    key.removeprefix("base_model.model.")
                    .replace(".lora_A.weight", ".weight")
                )
                lm_sd[base_key] += (b @ a) * scale  # torch W is [out, in]
            torch_lm.load_state_dict(lm_sd)

        from tiny_audio_tpu.pipeline import ASRPipeline

        t = np.arange(3 * 16000) / 16000
        wav = (0.3 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
        pipe = ASRPipeline(model)
        feats = pipe.processor.extract_features([wav])
        mel_np = np.asarray(feats["input_features"], np.float32)

        sd = load_file(str(out / "model.safetensors"))
        enc_dim, llm_dim, k = cfg.encoder_dim, cfg.llm_dim, cfg.projector_pool_stride

        class RefMLP(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.linear_1 = torch.nn.Linear(enc_dim * k, llm_dim, bias=False)
                self.norm = torch.nn.RMSNorm(llm_dim, eps=1e-6)
                self.linear_2 = torch.nn.Linear(llm_dim, llm_dim, bias=False)
                self.norm_2 = torch.nn.RMSNorm(llm_dim, eps=1e-6)

            def forward(self, x):
                b, t_, d = x.shape
                out_len = (t_ - k) // k + 1
                x = x[:, : out_len * k, :].reshape(b, out_len, d * k)
                x = self.norm(self.linear_1(x))
                x = torch.nn.functional.gelu(x)
                return self.norm_2(self.linear_2(x))

        projector = RefMLP().eval().float()
        projector.load_state_dict(
            {key.removeprefix("projector."): v for key, v in sd.items()}
        )

        with torch.no_grad():
            enc_out = torch_whisper.encoder(
                torch.from_numpy(mel_np)
            ).last_hidden_state
            audio_embeds = projector(enc_out)
            ids = model.build_prompt_ids(int(audio_embeds.shape[1]))
            ids_t = torch.tensor([ids], dtype=torch.long)
            embeds = torch_lm.get_input_embeddings()(ids_t)
            mask = ids_t == model.tokenizer.audio_token_id
            embeds[mask] = audio_embeds.reshape(-1, audio_embeds.shape[-1])
            gen = torch_lm.generate(
                inputs_embeds=embeds,
                attention_mask=torch.ones_like(ids_t),
                max_new_tokens=12, do_sample=False,
                eos_token_id=list(model.tokenizer.eos_token_ids),
                pad_token_id=model.tokenizer.pad_token_id,
            )
        oracle = gen[0].numpy()
        if oracle.shape[0] > 12:
            oracle = oracle[len(ids):]

        ours = model.generate(
            feats["input_features"], feats["audio_attention_mask"],
            mel_length=int(mel_np.shape[-1]),
        )[0]
        drop = set(model.tokenizer.eos_token_ids) | {model.tokenizer.pad_token_id}
        assert [int(x) for x in ours if int(x) not in drop] == [
            int(x) for x in oracle if int(x) not in drop
        ]
