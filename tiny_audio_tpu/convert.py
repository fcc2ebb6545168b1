"""HF / reference-checkpoint weight conversion into tiny_audio_tpu params.

The parity path (SURVEY.md §7 step 5): load the reference's published
checkpoint family — a Whisper/GLM-style encoder, a Qwen3 LM, and the trained
projector safetensors from ``mazesmazes/tiny-audio`` — and emit this
framework's parameter pytrees.  Tower converters live next to their modules
(:func:`~tiny_audio_tpu.models.encoder.convert_hf_whisper_encoder`,
:func:`~tiny_audio_tpu.models.decoder.convert_hf_qwen3`,
:func:`~tiny_audio_tpu.models.wav2vec2.convert_hf_wav2vec2`); this module
adds state-dict loading, the projector converter (reference naming matches
ours by design: linear_1/norm/linear_2/norm_2 etc,
``/root/reference/tiny_audio/projectors.py:23-71``), and the one-call
:func:`convert_checkpoint`.
"""

from __future__ import annotations

import json
import logging
import os
from pathlib import Path
from typing import Optional

import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def load_state_dict(path: str | Path) -> dict:
    """Load a torch/safetensors state dict from a file or HF checkpoint dir."""
    path = Path(path)
    if path.is_dir():
        files = sorted(path.glob("*.safetensors")) or sorted(
            path.glob("pytorch_model*.bin")
        )
        if not files:
            raise FileNotFoundError(f"no weight files in {path}")
        sd: dict = {}
        for f in files:
            sd.update(load_state_dict(f))
        return sd
    if path.suffix == ".safetensors":
        from safetensors.numpy import load_file

        return dict(load_file(str(path)))
    import torch

    sd = torch.load(str(path), map_location="cpu", weights_only=True)
    return {k: v for k, v in sd.items()}


def _np(w) -> np.ndarray:
    if hasattr(w, "detach"):
        return w.detach().cpu().float().numpy()
    return np.asarray(w)


# ------------------------------------------------------------------ projector


def convert_reference_projector(state_dict: dict, projector_type: str,
                                dtype=jnp.float32) -> dict:
    """Reference trained projector state_dict -> our projector params.

    Accepts keys with or without the ``projector.`` prefix (the reference's
    trainable-only ``state_dict`` uses it, asr_modeling.py:398-422).
    """
    sd = {k.removeprefix("projector."): _np(v) for k, v in state_dict.items()}

    def lin(name, transpose=True, cast=None):
        w = sd[name]
        if transpose:
            w = w.T
        return jnp.asarray(w, dtype=cast or dtype)

    if projector_type == "mlp":
        return {
            "linear_1": {"kernel": lin("linear_1.weight")},
            "norm": {"weight": lin("norm.weight", transpose=False)},
            "linear_2": {"kernel": lin("linear_2.weight")},
            "norm_2": {"weight": lin("norm_2.weight", transpose=False)},
        }

    if projector_type == "mosa":
        params: dict = {}
        for i in range(2):
            params[f"downsample_{i}"] = {
                # torch Conv1d [out, in, k] -> flax [k, in, out]
                "kernel": jnp.asarray(
                    sd[f"downsample.{i * 2}.weight"].transpose(2, 1, 0), dtype
                ),
                "bias": lin(f"downsample.{i * 2}.bias", transpose=False),
            }
        params["router_fc1"] = {
            "kernel": lin("router.0.weight"), "bias": lin("router.0.bias", False)
        }
        params["router_fc2"] = {
            "kernel": lin("router.2.weight"), "bias": lin("router.2.bias", False)
        }
        e = 0
        while f"experts.{e}.fc1.weight" in sd:
            params[f"expert_{e}"] = {
                "fc1": {"kernel": lin(f"experts.{e}.fc1.weight"),
                        "bias": lin(f"experts.{e}.fc1.bias", False)},
                "fc2": {"kernel": lin(f"experts.{e}.fc2.weight"),
                        "bias": lin(f"experts.{e}.fc2.bias", False)},
            }
            e += 1
        return params

    if projector_type == "moe":
        n = 0
        while f"experts.{n}.fc1.weight" in sd:
            n += 1
        return {
            "norm": {"weight": lin("norm.weight", transpose=False)},
            "router": {"kernel": lin("router.weight")},
            "shared_expert": {
                "fc1": {"kernel": lin("shared_expert.fc1.weight"),
                        "bias": lin("shared_expert.fc1.bias", False)},
                "fc2": {"kernel": lin("shared_expert.fc2.weight"),
                        "bias": lin("shared_expert.fc2.bias", False)},
            },
            "experts_fc1_kernel": jnp.stack(
                [lin(f"experts.{e}.fc1.weight") for e in range(n)]
            ),
            "experts_fc1_bias": jnp.stack(
                [lin(f"experts.{e}.fc1.bias", False) for e in range(n)]
            ),
            "experts_fc2_kernel": jnp.stack(
                [lin(f"experts.{e}.fc2.weight") for e in range(n)]
            ),
            "experts_fc2_bias": jnp.stack(
                [lin(f"experts.{e}.fc2.bias", False) for e in range(n)]
            ),
        }

    if projector_type == "qformer":
        # Reference QFormer = HF Blip2QFormerModel + query/encoder_proj/linear
        # (``/root/reference/tiny_audio/projectors.py:359-475``). Blip2 naming:
        # encoder.layer.{i}.attention.attention.{query,key,value} /
        # .attention.output.{dense,LayerNorm} / crossattention.* /
        # intermediate_query.dense / output_query.{dense,LayerNorm}, plus the
        # model-level embeddings ``layernorm``.
        def ln(name):
            return {
                "scale": lin(f"{name}.weight", transpose=False),
                "bias": lin(f"{name}.bias", transpose=False),
            }

        def dense_kb(name):
            return {
                "kernel": lin(f"{name}.weight"),
                "bias": lin(f"{name}.bias", transpose=False),
            }

        params = {
            "query": jnp.asarray(sd["query"], dtype),
            "ln_embed": ln("qformer.layernorm"),
            "linear": dense_kb("linear"),
        }
        if "encoder_proj.weight" in sd:
            params["encoder_proj"] = {"kernel": lin("encoder_proj.weight")}
        i = 0
        while f"qformer.encoder.layer.{i}.attention.attention.query.weight" in sd:
            base = f"qformer.encoder.layer.{i}"
            params[f"layer_{i}"] = {
                "self_q": dense_kb(f"{base}.attention.attention.query"),
                "self_k": dense_kb(f"{base}.attention.attention.key"),
                "self_v": dense_kb(f"{base}.attention.attention.value"),
                "self_out": dense_kb(f"{base}.attention.output.dense"),
                "ln_self": ln(f"{base}.attention.output.LayerNorm"),
                "cross_q": dense_kb(f"{base}.crossattention.attention.query"),
                "cross_k": dense_kb(f"{base}.crossattention.attention.key"),
                "cross_v": dense_kb(f"{base}.crossattention.attention.value"),
                "cross_out": dense_kb(f"{base}.crossattention.output.dense"),
                "ln_cross": ln(f"{base}.crossattention.output.LayerNorm"),
                "ffn_in": dense_kb(f"{base}.intermediate_query.dense"),
                "ffn_out": dense_kb(f"{base}.output_query.dense"),
                "ln_ffn": ln(f"{base}.output_query.LayerNorm"),
            }
            i += 1
        if i == 0:
            raise KeyError(
                "no Blip2QFormer layers found in qformer projector state dict; "
                f"sample keys: {sorted(sd)[:10]}"
            )
        return params

    raise ValueError(f"no reference converter for projector_type={projector_type!r}")


# ------------------------------------------------- reference checkpoint dirs


def config_from_reference_dir(ckpt_dir: str | Path):
    """Build our :class:`~tiny_audio_tpu.config.ASRConfig` from a REFERENCE
    checkpoint directory's ``config.json``.

    The reference serializes ``PretrainedConfig`` with top-level projector/
    generation fields (names mirror ours by design) plus nested
    ``audio_config`` / ``text_config`` HF tower dicts
    (``/root/reference/tiny_audio/asr_config.py:172-203``).  Tower dims are
    overlaid from those nested dicts; unknown HF-machinery keys
    (``auto_map``, ``custom_pipelines``, ...) are ignored.
    """
    import dataclasses as _dc

    from tiny_audio_tpu.config import (
        ASRConfig,
        decoder_kwargs_from_hf,
        encoder_kwargs_from_hf,
    )

    raw = json.loads((Path(ckpt_dir) / "config.json").read_text())
    # The reference aliases ``self.encoder = self.audio_config``
    # (asr_config.py:203), so serialized configs carry an ``encoder`` key
    # holding an HF tower dict — NOT our EncoderConfig shape.  Detect by the
    # HF ``model_type`` marker and reroute it to the audio_config overlay.
    raw = dict(raw)
    enc_raw = raw.get("encoder")
    if isinstance(enc_raw, dict) and "model_type" in enc_raw:
        raw.pop("encoder")
        raw.setdefault("audio_config", enc_raw)
    config = ASRConfig.from_dict(raw)
    audio_cfg = raw.get("audio_config")
    if isinstance(audio_cfg, dict):
        config.encoder = _dc.replace(
            config.encoder, **encoder_kwargs_from_hf(audio_cfg)
        )
    text_cfg = raw.get("text_config")
    if isinstance(text_cfg, dict):
        config.decoder = _dc.replace(
            config.decoder, **decoder_kwargs_from_hf(text_cfg)
        )
    config.__post_init__()  # re-derive encoder_dim/llm_dim from new towers
    return config


def convert_reference_checkpoint(
    ckpt_dir: str | Path,
    encoder_path: Optional[str | Path] = None,
    decoder_path: Optional[str | Path] = None,
    output_dir: Optional[str | Path] = None,
    tokenizer=None,
    seed: int = 0,
):
    """One-call conversion of a reference-format checkpoint DIRECTORY.

    The published artifact layout (``mazesmazes/tiny-audio``;
    ``/root/reference/tiny_audio/asr_modeling.py:825-852``) is: ``config.json``
    (composite ASRConfig with nested tower configs), ``model.safetensors``
    holding the trainable weights with ``projector.``-prefixed keys
    (``asr_modeling.py:398-422``), tokenizer/feature-extractor files, and
    copied source .py files.  Tower weights are NOT in the artifact — the
    reference re-downloads them from ``audio_model_id`` / ``text_model_id``;
    pass ``encoder_path`` / ``decoder_path`` to point at local tower
    checkpoints (defaults to the config ids when those are local dirs).
    """
    ckpt_dir = Path(ckpt_dir)
    config = config_from_reference_dir(ckpt_dir)

    if encoder_path is None and Path(config.audio_model_id).is_dir():
        encoder_path = config.audio_model_id
    if decoder_path is None and Path(config.text_model_id).is_dir():
        decoder_path = config.text_model_id

    model = convert_checkpoint(
        config,
        encoder_path=encoder_path,
        decoder_path=decoder_path,
        projector_path=ckpt_dir,
        output_dir=output_dir,
        seed=seed,
    )
    if tokenizer is not None:
        model.tokenizer = tokenizer
        model.gen_config = model.gen_config.__class__.from_asr_config(
            model.config, tokenizer.eos_token_ids, tokenizer.pad_token_id
        )
    return model


# ----------------------------------------------------------------- full model


def convert_checkpoint(
    config,
    encoder_path: Optional[str | Path] = None,
    decoder_path: Optional[str | Path] = None,
    projector_path: Optional[str | Path] = None,
    aligner_path: Optional[str | Path] = None,
    ecapa_path: Optional[str | Path] = None,
    output_dir: Optional[str | Path] = None,
    seed: int = 0,
):
    """Build an :class:`ASRModel` from HF/reference torch checkpoints.

    Any tower path may be None (that tower keeps its random init).  When
    ``output_dir`` is given the converted model is saved in this framework's
    checkpoint format.
    """
    from tiny_audio_tpu.models.asr import ASRModel
    from tiny_audio_tpu.models.decoder import convert_hf_qwen3
    from tiny_audio_tpu.models.encoder import convert_hf_audio_encoder

    if encoder_path:
        # Provenance-check encoder dims against the checkpoint's own
        # config.json when present (covers whisper + GLM composite configs).
        # Only keys the checkpoint ACTUALLY carries are overlaid — building
        # a whole EncoderConfig from a sparse config.json would fill the
        # missing fields with dataclass defaults and silently clobber a
        # user-supplied config (e.g. custom conv_layers, which HF Whisper
        # configs don't record).
        import dataclasses as _dc
        import json as _json

        cfg_json = Path(encoder_path) / "config.json"
        if cfg_json.is_file():
            from tiny_audio_tpu.config import encoder_kwargs_from_hf

            found = encoder_kwargs_from_hf(_json.loads(cfg_json.read_text()))
            changed = {
                k: v for k, v in found.items()
                if getattr(config.encoder, k) != v
            }
            if changed:
                logger.warning(
                    "encoder config overridden by %s/config.json: %s",
                    encoder_path, changed,
                )
                config.encoder = _dc.replace(config.encoder, **changed)

    if decoder_path:
        # same provenance overlay for the text tower (qwen3 or llama family)
        import dataclasses as _dc
        import json as _json

        cfg_json = Path(decoder_path) / "config.json"
        if cfg_json.is_file():
            from tiny_audio_tpu.config import decoder_kwargs_from_hf

            found = decoder_kwargs_from_hf(_json.loads(cfg_json.read_text()))
            changed = {
                k: v for k, v in found.items()
                if getattr(config.decoder, k) != v
            }
            if changed:
                logger.warning(
                    "decoder config overridden by %s/config.json: %s",
                    decoder_path, changed,
                )
                config.decoder = _dc.replace(config.decoder, **changed)

    dtype = jnp.bfloat16 if config.model_dtype == "bfloat16" else jnp.float32
    model = ASRModel(config, seed=seed)

    if encoder_path:
        model.params["encoder"] = convert_hf_audio_encoder(
            load_state_dict(encoder_path), config.encoder, dtype=dtype
        )
    if decoder_path:
        converted = convert_hf_qwen3(
            load_state_dict(decoder_path), config.decoder, dtype=dtype
        )
        if config.use_lora:
            # HF base checkpoints carry no adapters (the reference attaches
            # PEFT ones post-load, asr_modeling.py:256-270); keep the model's
            # freshly-initialized LoRA leaves or the tree no longer matches
            # the module and apply() fails.
            from tiny_audio_tpu.models.asr import merge_lora, split_lora

            _, lora_fresh = split_lora(model.params["decoder"])
            converted = merge_lora(converted, lora_fresh)
        model.params["decoder"] = converted
    if projector_path:
        model.params["projector"] = convert_reference_projector(
            load_state_dict(projector_path), config.projector_type
        )
    if aligner_path:
        from tiny_audio_tpu.alignment import ForcedAligner
        from tiny_audio_tpu.models.wav2vec2 import convert_hf_wav2vec2

        w2v_params = convert_hf_wav2vec2(load_state_dict(aligner_path))
        if output_dir:
            from flax import serialization

            out = Path(output_dir)
            out.mkdir(parents=True, exist_ok=True)
            (out / "wav2vec2_aligner.msgpack").write_bytes(
                serialization.to_bytes(w2v_params)
            )
        from tiny_audio_tpu.models.wav2vec2 import Wav2Vec2CTC

        ForcedAligner._model = Wav2Vec2CTC()  # attach for this process
        ForcedAligner._params = w2v_params

    if ecapa_path:
        # speechbrain spkrec-ecapa-voxceleb embedding_model.ckpt (reference
        # diarization.py:470-479) -> flax; attach as the process singleton.
        from tiny_audio_tpu.diarization import EcapaEmbedder

        embedder = EcapaEmbedder.from_speechbrain(load_state_dict(ecapa_path))
        EcapaEmbedder._instance = embedder
        if output_dir:
            from flax import serialization

            out = Path(output_dir)
            out.mkdir(parents=True, exist_ok=True)
            (out / "ecapa_embedder.msgpack").write_bytes(
                serialization.to_bytes(embedder.params)
            )

    if encoder_path and os.environ.get("TA_SKIP_ATTN_CALIBRATION") != "1":
        # The TPU encoder-attention kernel's constant-shift softmax is exact
        # only for row-max scores in its fixed window — a property of the
        # CHECKPOINT (observed |s| <~ 30 on the shipped family, >4x margin).
        # Calibrate every imported encoder here so a hotter checkpoint fails
        # loudly at import instead of silently flattening rows on TPU.
        from tiny_audio_tpu.debug import calibrate_attention_window

        report = calibrate_attention_window(model)
        logger.info(
            "encoder attention row-max scores in [%.1f, %.1f] "
            "(kernel window [%.0f, %.0f])",
            report["row_max_lo"], report["row_max_hi"], *report["window"],
        )
        if not report["ok"]:
            logger.warning(
                "imported encoder's attention scores FALL OUTSIDE the "
                "constant-shift softmax window [%.0f, %.0f] (observed "
                "[%.1f, %.1f]) — the TPU kernel would be inexact for this "
                "checkpoint; set TA_FORCE_FLASH=1 to dispatch the exact "
                "library flash kernel instead",
                *report["window"], report["row_max_lo"], report["row_max_hi"],
            )

    if output_dir:
        model.save_pretrained(output_dir)
    return model
