"""Trace one audio sample through every stage of the model.

Pedagogical counterpart to the reference's ``docs/course/examples/trace_data.py``
(which downloads LibriSpeech + the published checkpoint).  This version is
fully offline: it synthesizes speech (``utils/speech_synth``) and builds a
tiny random-weight model (``tiny_test_config`` — the same stand-in the test
suite uses), then prints shape/statistics at each stage — mel front-end →
conv stack → encoder → projector → prompt splice → decode — and saves plots
when matplotlib is available.

Run: ``python docs/examples/trace_data.py``
"""

from __future__ import annotations

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tiny_audio_tpu.config import (
        compute_encoder_output_length,
        tiny_test_config,
    )
    from tiny_audio_tpu.models.asr import ASRModel
    from tiny_audio_tpu.ops import mel
    from tiny_audio_tpu.utils.speech_synth import synth_utterance

    # --- 1. one audio sample (synthetic; exact ground-truth speech mask) ---
    audio, speech_mask = synth_utterance(5.0, seed=7)
    sr = 16000
    print(f"audio: {len(audio) / sr:.2f}s @ {sr} Hz, "
          f"{speech_mask.mean():.0%} voiced")

    # --- 2. a tiny model (random weights: shapes and flow, not transcripts) ---
    cfg = tiny_test_config(max_new_tokens=8)
    model = ASRModel(cfg, seed=0)
    print(f"model: {cfg.projector_type} projector, "
          f"{cfg.encoder.num_layers}-layer encoder, "
          f"{cfg.decoder.num_layers}-layer decoder (random init)")

    # --- 3. mel front-end (jitted; Whisper-compatible numerics) ---
    feats = mel.log_mel_spectrogram(
        jnp.asarray(audio)[None], num_mel_bins=cfg.encoder.num_mel_bins
    )
    n_frames = feats.shape[-1]
    frame_mask = mel.frame_attention_mask(jnp.asarray([len(audio)]), n_frames)
    print(f"mel: {tuple(feats.shape)}  [batch, mel bins, frames]  "
          f"range [{float(feats.min()):.2f}, {float(feats.max()):.2f}]")

    # --- 4. conv formula: mel frames -> encoder positions -> audio tokens ---
    enc_len = int(compute_encoder_output_length(n_frames, cfg.encoder.conv_layers))
    n_audio = model._num_audio_tokens(n_frames)
    print(f"lengths: {n_frames} mel frames -> {enc_len} encoder positions "
          f"-> {n_audio} <audio> tokens ({cfg.projector_type} compression)")

    # --- 5. encoder + projector (the trainable bridge) ---
    enc_out = model.encoder.apply(
        {"params": model.params["encoder"]}, feats, frame_mask=frame_mask
    )
    print(f"encoder out: {tuple(enc_out.shape)}  "
          f"rms {float(jnp.sqrt((enc_out.astype(jnp.float32) ** 2).mean())):.3f}")
    proj_out, aux = model.projector.apply(
        {"params": model.params["projector"]}, enc_out, train=False
    )
    print(f"projector out: {tuple(proj_out.shape)}  "
          f"rms {float(jnp.sqrt((proj_out.astype(jnp.float32) ** 2).mean())):.3f} "
          f"aux loss {float(aux):.4f} "
          f"(output RMSNorm matches the LM embedding scale)")

    # --- 6. prompt build + splice ---
    ids = model.build_prompt_ids(n_audio)
    input_ids = jnp.asarray(np.array(ids, np.int32)[None])
    embeds = model._splice_embeds_jit(model.params, feats, frame_mask, input_ids)
    print(f"prompt: {input_ids.shape[1]} tokens ({n_audio} audio + "
          f"{input_ids.shape[1] - n_audio} text), spliced embeds "
          f"{tuple(embeds.shape)}")

    # --- 7. decode (random weights -> gibberish ids, but the full path) ---
    tokens = model.generate(feats, frame_mask, mel_length=n_frames)
    print(f"decoded token ids: {np.asarray(tokens)[0][:8].tolist()}")

    # --- 8. optional plots ---
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(3, 1, figsize=(10, 8))
        t = np.arange(len(audio)) / sr
        axes[0].plot(t, audio, lw=0.3)
        axes[0].fill_between(t, -0.3, 0.3, where=speech_mask, alpha=0.2)
        axes[0].set_title("waveform (shaded = ground-truth speech)")
        axes[1].imshow(np.asarray(feats[0]), aspect="auto", origin="lower")
        axes[1].set_title("log-mel spectrogram")
        axes[2].imshow(
            np.asarray(proj_out[0].astype(jnp.float32)).T, aspect="auto"
        )
        axes[2].set_title("projector output (audio tokens x LM dims)")
        fig.tight_layout()
        fig.savefig("trace_data.png", dpi=80)
        print("plots saved to trace_data.png")
    except ImportError:
        print("matplotlib not available; skipped plots")


if __name__ == "__main__":
    main()
