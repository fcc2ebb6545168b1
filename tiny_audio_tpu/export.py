"""Reverse interop: tiny_audio_tpu checkpoint -> reference HF artifact.

``convert.py`` maps the reference's published artifact INTO this framework;
this module closes the loop (VERDICT r3 next-round #4): a projector (and
optionally a fine-tuned decoder / LoRA adapters) trained HERE is emitted in
the exact file layout the torch reference writes and reloads
(``/root/reference/tiny_audio/asr_modeling.py:397-421`` ``state_dict`` /
``:825-852`` ``save_pretrained``, ``/root/reference/scripts/hub/push.py``):

- ``model.safetensors`` — trainable weights in torch naming:
  ``projector.*`` always; ``language_model.*`` (flattened HF names) when the
  decoder was fine-tuned.
- ``adapter_model.safetensors`` + ``adapter_config.json`` — PEFT-layout LoRA
  adapters when ``use_lora`` (the reference attaches them with PEFT).
- ``config.json`` — reference ``ASRConfig`` PretrainedConfig serialization:
  top-level projector/generation fields, ``auto_map`` + ``custom_pipelines``
  (so ``transformers.pipeline(..., trust_remote_code=True)`` resolves), and
  nested ``audio_config`` / ``text_config`` HF tower dicts (plus the
  ``encoder`` alias the reference emits, asr_config.py:203).
- ``preprocessor_config.json`` (+ tokenizer files when the model wraps a
  real HF tokenizer).

The reference artifact also carries copied ``asr_*.py`` sources (it is a
code-carrying artifact); this exporter intentionally does NOT ship the
reference's code — the consumer installs/points at the reference package.
The offline reversed dress rehearsal
(``tests/test_reverse_export.py``) instead validates the weight/config
contract directly against a torch-composed oracle.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np


def _w(x) -> np.ndarray:
    """Param leaf -> float32 numpy (torch state dicts are fp32 on disk)."""
    return np.asarray(x, dtype=np.float32)


# ------------------------------------------------------------------ projector


def export_projector_state(params: dict, projector_type: str) -> dict:
    """Our projector param tree -> reference torch ``state_dict`` naming
    (WITHOUT the ``projector.`` prefix) — the exact inverse of
    :func:`tiny_audio_tpu.convert.convert_reference_projector`."""
    p = params

    if projector_type == "mlp":
        return {
            "linear_1.weight": _w(p["linear_1"]["kernel"]).T,
            "norm.weight": _w(p["norm"]["weight"]),
            "linear_2.weight": _w(p["linear_2"]["kernel"]).T,
            "norm_2.weight": _w(p["norm_2"]["weight"]),
        }

    if projector_type == "mosa":
        sd: dict = {}
        for i in range(2):
            # flax Conv [k, in, out] -> torch Conv1d [out, in, k]
            sd[f"downsample.{i * 2}.weight"] = _w(
                p[f"downsample_{i}"]["kernel"]
            ).transpose(2, 1, 0)
            sd[f"downsample.{i * 2}.bias"] = _w(p[f"downsample_{i}"]["bias"])
        sd["router.0.weight"] = _w(p["router_fc1"]["kernel"]).T
        sd["router.0.bias"] = _w(p["router_fc1"]["bias"])
        sd["router.2.weight"] = _w(p["router_fc2"]["kernel"]).T
        sd["router.2.bias"] = _w(p["router_fc2"]["bias"])
        e = 0
        while f"expert_{e}" in p:
            for fc in ("fc1", "fc2"):
                sd[f"experts.{e}.{fc}.weight"] = _w(p[f"expert_{e}"][fc]["kernel"]).T
                sd[f"experts.{e}.{fc}.bias"] = _w(p[f"expert_{e}"][fc]["bias"])
            e += 1
        return sd

    if projector_type == "moe":
        sd = {
            "norm.weight": _w(p["norm"]["weight"]),
            "router.weight": _w(p["router"]["kernel"]).T,
            "shared_expert.fc1.weight": _w(p["shared_expert"]["fc1"]["kernel"]).T,
            "shared_expert.fc1.bias": _w(p["shared_expert"]["fc1"]["bias"]),
            "shared_expert.fc2.weight": _w(p["shared_expert"]["fc2"]["kernel"]).T,
            "shared_expert.fc2.bias": _w(p["shared_expert"]["fc2"]["bias"]),
        }
        n = int(np.asarray(p["experts_fc1_kernel"]).shape[0])
        for e in range(n):
            sd[f"experts.{e}.fc1.weight"] = _w(p["experts_fc1_kernel"][e]).T
            sd[f"experts.{e}.fc1.bias"] = _w(p["experts_fc1_bias"][e])
            sd[f"experts.{e}.fc2.weight"] = _w(p["experts_fc2_kernel"][e]).T
            sd[f"experts.{e}.fc2.bias"] = _w(p["experts_fc2_bias"][e])
        return sd

    if projector_type == "qformer":
        sd = {
            "query": _w(p["query"]),
            "qformer.layernorm.weight": _w(p["ln_embed"]["scale"]),
            "qformer.layernorm.bias": _w(p["ln_embed"]["bias"]),
            "linear.weight": _w(p["linear"]["kernel"]).T,
            "linear.bias": _w(p["linear"]["bias"]),
        }
        if "encoder_proj" in p:
            sd["encoder_proj.weight"] = _w(p["encoder_proj"]["kernel"]).T
        blip = {
            "self_q": "attention.attention.query",
            "self_k": "attention.attention.key",
            "self_v": "attention.attention.value",
            "self_out": "attention.output.dense",
            "ln_self": "attention.output.LayerNorm",
            "cross_q": "crossattention.attention.query",
            "cross_k": "crossattention.attention.key",
            "cross_v": "crossattention.attention.value",
            "cross_out": "crossattention.output.dense",
            "ln_cross": "crossattention.output.LayerNorm",
            "ffn_in": "intermediate_query.dense",
            "ffn_out": "output_query.dense",
            "ln_ffn": "output_query.LayerNorm",
        }
        i = 0
        while f"layer_{i}" in p:
            layer = p[f"layer_{i}"]
            base = f"qformer.encoder.layer.{i}"
            for ours, theirs in blip.items():
                if ours.startswith("ln_"):
                    sd[f"{base}.{theirs}.weight"] = _w(layer[ours]["scale"])
                    sd[f"{base}.{theirs}.bias"] = _w(layer[ours]["bias"])
                else:
                    sd[f"{base}.{theirs}.weight"] = _w(layer[ours]["kernel"]).T
                    sd[f"{base}.{theirs}.bias"] = _w(layer[ours]["bias"])
            i += 1
        return sd

    raise ValueError(f"no reference exporter for projector_type={projector_type!r}")


# -------------------------------------------------------------------- decoder


def export_decoder_state(params: dict, cfg) -> dict:
    """Our decoder param tree (scan-stacked layers) -> flattened HF
    causal-LM naming (inverse of ``convert_hf_qwen3``; covers the
    qwen3/llama/gemma-v1 families — identical key layout, the family only
    changes which norm weights exist).  LoRA leaves are SKIPPED here (the
    reference does the same — they serialize separately as PEFT adapters,
    asr_modeling.py:397-421)."""
    layers = params["layers"]
    n_layers = cfg.num_layers
    sd: dict = {"model.embed_tokens.weight": _w(params["embed_tokens"]["embedding"])}
    for i in range(n_layers):
        base = f"model.layers.{i}"
        sd[f"{base}.input_layernorm.weight"] = _w(
            layers["input_layernorm"]["weight"][i]
        )
        sd[f"{base}.post_attention_layernorm.weight"] = _w(
            layers["post_attention_layernorm"]["weight"][i]
        )
        for name in ("q_proj", "k_proj", "v_proj", "o_proj"):
            sd[f"{base}.self_attn.{name}.weight"] = _w(layers[name]["kernel"][i]).T
        for name in ("gate_proj", "up_proj", "down_proj"):
            sd[f"{base}.mlp.{name}.weight"] = _w(layers[name]["kernel"][i]).T
        if cfg.qk_norm:
            sd[f"{base}.self_attn.q_norm.weight"] = _w(layers["q_norm"][i])
            sd[f"{base}.self_attn.k_norm.weight"] = _w(layers["k_norm"][i])
    sd["model.norm.weight"] = _w(params["norm"]["weight"])
    if not cfg.tie_word_embeddings:
        sd["lm_head.weight"] = _w(params["lm_head"]["kernel"]).T
    return sd


def export_lora_adapter(
    params: dict, config, base_model: str | None = None
) -> tuple[dict, dict]:
    """Our in-tree LoRA leaves (``layers/{target}_lora_a|b``, scan-stacked)
    -> PEFT ``adapter_model.safetensors`` naming + ``adapter_config.json``.

    PEFT layout (what the reference's ``language_model.save_pretrained``
    emits): ``base_model.model.model.layers.{i}.self_attn.q_proj.lora_A.weight``
    with torch Linear convention — ``lora_A`` is [r, in] (our ``a`` is
    [in, r]), ``lora_B`` is [out, r] (our ``b`` is [r, out]).

    ``base_model`` lands in ``base_model_name_or_path``: the reference's
    push rewrites it to the LM repo id because ``transformers.pipeline()``
    cannot resolve the PEFT base otherwise
    (/root/reference/tiny_audio/asr_modeling.py:796-823).  Defaults to the
    config's ``text_model_id`` (override with a hub id when publishing)."""
    layers = params["layers"]
    targets = [t for t in config.lora_target_modules
               if f"{t}_lora_a" in layers]
    sd: dict = {}
    n_layers = config.decoder.num_layers
    for i in range(n_layers):
        for t in targets:
            sub = "self_attn" if t.endswith(("q_proj", "k_proj", "v_proj", "o_proj")) else "mlp"
            base = f"base_model.model.model.layers.{i}.{sub}.{t}"
            sd[f"{base}.lora_A.weight"] = _w(layers[f"{t}_lora_a"][i]).T
            sd[f"{base}.lora_B.weight"] = _w(layers[f"{t}_lora_b"][i]).T
    adapter_config = {
        "peft_type": "LORA",
        "task_type": "CAUSAL_LM",
        "r": int(config.lora_rank),
        "lora_alpha": int(config.lora_alpha),
        "lora_dropout": float(config.lora_dropout),
        "target_modules": list(targets),
        "bias": "none",
        "base_model_name_or_path": (
            base_model if base_model is not None else config.text_model_id
        ),
        "fan_in_fan_out": False,
        "inference_mode": True,
    }
    return sd, adapter_config


# --------------------------------------------------------------------- config


def _model_type(dec_cfg) -> str:
    if dec_cfg.qk_norm:
        return "qwen3"
    if getattr(dec_cfg, "rms_norm_offset", False):
        return "gemma"
    return "llama"


def _tower_config_dicts(config) -> tuple[dict, dict]:
    """(audio_config, text_config) HF dicts.  When the model's tower ids
    point at local HF checkpoint dirs their ``config.json`` is reproduced
    verbatim (exact round-trip); otherwise minimal dicts are synthesized
    from our dataclasses (enough for ``config_from_reference_dir`` and HF
    ``AutoConfig`` consumers to recover every dimension)."""
    audio_cfg = text_cfg = None
    enc_json = Path(config.audio_model_id) / "config.json"
    if enc_json.is_file():
        audio_cfg = json.loads(enc_json.read_text())
    dec_json = Path(config.text_model_id) / "config.json"
    if dec_json.is_file():
        text_cfg = json.loads(dec_json.read_text())
    enc = config.encoder
    if audio_cfg is None:
        audio_cfg = {
            "model_type": "whisper",
            "num_mel_bins": enc.num_mel_bins,
            "d_model": enc.d_model,
            "encoder_layers": enc.num_layers,
            "encoder_attention_heads": enc.num_heads,
            "encoder_ffn_dim": enc.ffn_dim,
            "max_source_positions": enc.max_source_positions,
        }
    dec = config.decoder
    if text_cfg is None:
        text_cfg = {
            "model_type": _model_type(dec),
            "vocab_size": dec.vocab_size,
            "hidden_size": dec.hidden_size,
            "num_hidden_layers": dec.num_layers,
            "num_attention_heads": dec.num_heads,
            "num_key_value_heads": dec.num_kv_heads,
            "head_dim": dec.head_dim,
            "intermediate_size": dec.intermediate_size,
            "rope_theta": dec.rope_theta,
            "rms_norm_eps": dec.rms_norm_eps,
            "tie_word_embeddings": dec.tie_word_embeddings,
            "max_position_embeddings": dec.max_position_embeddings,
        }
    return audio_cfg, text_cfg


def export_reference_config(
    config,
    audio_model_id: str | None = None,
    text_model_id: str | None = None,
) -> dict:
    """Reference ``ASRConfig`` PretrainedConfig-serialization dict
    (asr_config.py:113-220 layout, incl. the HF auto-loading plumbing).

    ``audio_model_id``/``text_model_id`` override the serialized tower ids:
    in this offline setup the config's ids are local absolute paths, and the
    reference's ``ASRModel.from_pretrained`` composes towers from these ids
    (asr_modeling.py:203-254) — pass hub ids to make the artifact portable.
    The nested ``audio_config``/``text_config`` dicts stay authoritative for
    dimensions either way."""
    audio_cfg, text_cfg = _tower_config_dicts(config)
    out = {
        "model_type": "asr_model",
        "architectures": ["ASRModel"],
        "auto_map": {
            "AutoConfig": "asr_config.ASRConfig",
            "AutoModel": "asr_modeling.ASRModel",
        },
        "custom_pipelines": {
            "automatic-speech-recognition": {
                "impl": "asr_pipeline.ASRPipeline",
                "pt": ["AutoModel"],
                "tf": [],
            }
        },
        "audio_model_id": audio_model_id or config.audio_model_id,
        "text_model_id": text_model_id or config.text_model_id,
        "attn_implementation": "sdpa",
        "model_dtype": config.model_dtype,
        "encoder_dim": config.encoder_dim,
        "llm_dim": config.llm_dim,
        "encoder_conv_layers": [list(t) for t in config.encoder_conv_layers],
        "audio_sample_rate": config.audio_sample_rate,
        "system_prompt": config.system_prompt,
        "projector_type": config.projector_type,
        "projector_pool_stride": config.projector_pool_stride,
        "downsample_rate": config.downsample_rate,
        "projector_hidden_dim": config.projector_hidden_dim,
        "audio_token_dropout": config.audio_token_dropout,
        "num_experts": config.num_experts,
        "num_experts_per_tok": config.num_experts_per_tok,
        "qformer_window_size": config.qformer_window_size,
        "qformer_num_layers": config.qformer_num_layers,
        "qformer_num_heads": config.qformer_num_heads,
        "use_lora": config.use_lora,
        "lora_rank": config.lora_rank,
        "lora_alpha": config.lora_alpha,
        "lora_dropout": config.lora_dropout,
        "lora_target_modules": list(config.lora_target_modules),
        "freeze_language_model": config.freeze_language_model,
        "max_new_tokens": config.max_new_tokens,
        "min_new_tokens": config.min_new_tokens,
        "num_beams": config.num_beams,
        "repetition_penalty": config.repetition_penalty,
        "length_penalty": config.length_penalty,
        "no_repeat_ngram_size": config.no_repeat_ngram_size,
        "do_sample": config.do_sample,
        "temperature": config.temperature,
        "top_p": config.top_p,
        "top_k": config.top_k,
        "audio_config": audio_cfg,
        "text_config": text_cfg,
        # the reference aliases self.encoder = self.audio_config
        # (asr_config.py:203) so serialized artifacts carry both keys
        "encoder": audio_cfg,
    }
    return out


# ------------------------------------------------------------------- artifact


def export_reference_artifact(
    model,
    output_dir: str | Path,
    audio_model_id: str | None = None,
    text_model_id: str | None = None,
) -> Path:
    """Write ``model`` as a reference-layout HF artifact directory.

    What lands in ``model.safetensors`` follows the reference's trainable
    contract exactly: ``projector.*`` always; flattened ``language_model.*``
    when ``freeze_language_model=False`` (fine-tuned decoder); LoRA leaves
    as separate PEFT adapter files when ``use_lora``.

    ``audio_model_id``/``text_model_id`` override the tower ids serialized
    into ``config.json`` and the PEFT ``base_model_name_or_path`` (pass hub
    ids when publishing; see ``export_reference_config``).
    """
    from safetensors.numpy import save_file

    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)

    sd = {
        f"projector.{k}": v
        for k, v in export_projector_state(
            model.params["projector"], model.config.projector_type
        ).items()
    }
    if not model.config.freeze_language_model:
        sd.update(
            {
                f"language_model.{k}": v
                for k, v in export_decoder_state(
                    model.params["decoder"], model.config.decoder
                ).items()
            }
        )
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()},
              str(out / "model.safetensors"))

    if model.config.use_lora:
        adapter_sd, adapter_cfg = export_lora_adapter(
            model.params["decoder"], model.config, base_model=text_model_id
        )
        if adapter_sd:
            save_file(
                {k: np.ascontiguousarray(v) for k, v in adapter_sd.items()},
                str(out / "adapter_model.safetensors"),
            )
            (out / "adapter_config.json").write_text(
                json.dumps(adapter_cfg, indent=2)
            )

    (out / "config.json").write_text(
        json.dumps(
            export_reference_config(
                model.config,
                audio_model_id=audio_model_id,
                text_model_id=text_model_id,
            ),
            indent=2,
        )
    )
    (out / "preprocessor_config.json").write_text(
        json.dumps(
            {
                "processor_class": "ASRProcessor",
                "auto_map": {"AutoProcessor": "asr_processing.ASRProcessor"},
                "feature_size": model.config.encoder.num_mel_bins,
                "sampling_rate": model.config.audio_sample_rate,
            },
            indent=2,
        )
    )

    # real HF tokenizers ship with the artifact (the reference saves the
    # tokenizer into the checkpoint dir); the offline ByteTokenizer has no
    # HF serialization and is skipped.
    hf_tok = getattr(model.tokenizer, "tok", None)
    if hf_tok is not None and hasattr(hf_tok, "save_pretrained"):
        hf_tok.save_pretrained(out)

    return out
