"""Re-derive the docs/performance.md stage table from the CURRENT code.

Round-4 review (VERDICT item 1): the stage table billed LM prefill at
~360 ms for B=32 x ~470 tokens while scripts/bench_prefill.py measures the
isolated decoder prefill at ~158 ms (97.7 TFLOP/s) — so the table was
mis-attributed.  This script times each stage of the e2e serving path as
its own jitted sub-graph at the serving batch, plus the full generate, so
the residual (full − parts) is explicit instead of silently billed to a
stage.

Stages (matching bench.py's graph structure, int8 KV serving config):
  frontend   mel spectrogram + frame mask
  enc+splice encoder -> projector -> prompt embed -> splice (_splice_embeds_jit)
  prefill    decoder forward over the spliced prompt, cache write, 1 logit
  e2e        model.generate (all of the above + 128-step decode loop)
  decode     e2e − (frontend + enc+splice + prefill)   [residual]

Run: PYTHONPATH=/root/.axon_site:. python scripts/bench_stages.py
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from tiny_audio_tpu.config import ASRConfig
from tiny_audio_tpu.models.asr import ASRModel
from tiny_audio_tpu.ops import mel
from tiny_audio_tpu.utils.compile_cache import enable_persistent_compile_cache
from tiny_audio_tpu.utils.profiling import block_until_ready_via_host

REPS = 5


def timed(fn, *args):
    out = fn(*args)
    block_until_ready_via_host(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    block_until_ready_via_host(out)
    return (time.perf_counter() - t0) / REPS * 1e3


def main() -> None:
    enable_persistent_compile_cache()
    batch = int(os.environ.get("TA_BENCH_BATCH", "48"))
    cfg = ASRConfig()
    cfg.kv_cache_dtype = "int8"
    model = ASRModel(cfg, seed=0)

    clip_s = 30.0
    n_samples = int(clip_s * 16000)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        np.clip(rng.standard_normal((batch, n_samples)) * 0.1, -1, 1),
        jnp.float32,
    )
    n_frames = n_samples // mel.HOP_LENGTH
    lengths = jnp.asarray(np.full((batch,), n_samples))

    @jax.jit
    def frontend(audio, lengths):
        feats = mel.log_mel_spectrogram(audio, num_mel_bins=cfg.encoder.num_mel_bins)
        return feats, mel.frame_attention_mask(lengths, n_frames)

    feats, mask = frontend(audio, lengths)
    block_until_ready_via_host((feats, mask))

    # prompt at the real serving shape (identical to model.generate's build)
    n_audio = model._num_audio_tokens(n_frames)
    ids = model.build_prompt_ids(n_audio)
    t_real = len(ids)
    t_pad = model._bucket_prompt_len(t_real, n_audio)
    ids_np = np.full((batch, t_pad), model.gen_config.pad_token_id, np.int32)
    ids_np[:, :t_real] = ids
    input_ids = jnp.asarray(ids_np)
    print(f"batch={batch} prompt t_real={t_real} t_pad={t_pad} "
          f"n_audio={n_audio}", flush=True)

    ms_front = timed(frontend, audio, lengths)
    print(f"frontend            {ms_front:8.1f} ms", flush=True)

    splice = model._splice_embeds_jit
    ms_splice = timed(splice, model.params, feats, mask, input_ids)
    print(f"encoder+proj+splice {ms_splice:8.1f} ms", flush=True)

    embeds = splice(model.params, feats, mask, input_ids)
    block_until_ready_via_host(embeds)

    from tiny_audio_tpu.generation import prefill_prompt_cache

    dec_vars = model.decoder_variables()
    prompt_len = jnp.int32(t_real)

    @jax.jit
    def prefill(variables, embeds, prompt_len):
        return prefill_prompt_cache(
            model.decoder, variables, embeds, prompt_len=prompt_len
        )

    ms_prefill = timed(prefill, dec_vars, embeds, prompt_len)
    print(f"prefill             {ms_prefill:8.1f} ms", flush=True)

    def e2e():
        return model.generate(feats, mask, mel_length=n_frames)

    e2e()  # compile
    t0 = time.perf_counter()
    for _ in range(REPS):
        e2e()
    ms_e2e = (time.perf_counter() - t0) / REPS * 1e3

    residual = ms_e2e - ms_front - ms_splice - ms_prefill
    print(f"e2e generate        {ms_e2e:8.1f} ms", flush=True)
    print(f"decode (residual)   {residual:8.1f} ms "
          f"({residual / float(cfg.max_new_tokens):.2f} ms/step x "
          f"{cfg.max_new_tokens})", flush=True)
    rtfx = batch * clip_s / (ms_e2e / 1e3)
    print(f"RTFx (compute-only) {rtfx:8.1f}", flush=True)


if __name__ == "__main__":
    main()
