#!/usr/bin/env python3
"""Benchmark: end-to-end ASR inference throughput on one TPU chip.

Measures RTFx (seconds of audio processed per wall-clock second) for the
flagship model — GLM-ASR-Nano-class encoder (~630M) + Qwen3-0.6B-class
decoder (~600M), bf16, random weights (throughput does not depend on weight
values) — over batches of 30 s utterances with the full pipeline: mel
front-end -> encoder -> projector -> prompt splice -> KV-cached greedy decode
of the full ``max_new_tokens=128`` budget (no-EOS worst case; real decodes
stop earlier, so this is a conservative bound).

Baseline: the reference (torch, single A40) publishes no RTF numbers
(BASELINE.md).  We estimate its A40 batch-1 pipeline at ~20x realtime for 30 s
clips — full bandwidth/FLOP derivation in BASELINE.md ("Derivation of the
A40 RTFx estimate"); the driver target is >=5x A40 per chip,
so ``vs_baseline = rtfx / (5 * 20)`` — 1.0 means the 5x target is met.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

A40_RTFX_ESTIMATE = 20.0
TARGET_MULTIPLE = 5.0


def probe_backend() -> bool:
    """Backend liveness probe in a SUBPROCESS: when the remote-TPU tunnel
    on this rig dies, the first backend touch hangs indefinitely with no
    error (relay ports connection-refused) — a subprocess timeout is the
    only way to turn that into a diagnosable failure instead of a hung
    bench.  Returns True when the backend answered."""
    import os
    import subprocess
    import sys

    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=float(os.environ.get("TA_BENCH_PROBE_S", "300")),
            capture_output=True, check=True,
        )
        return True
    except subprocess.TimeoutExpired:
        return False
    except subprocess.CalledProcessError:
        return False


def _last_live_result() -> dict | None:
    """Newest prior driver bench artifact (BENCH_r*.json beside this file)
    with a live nonzero measurement, or None."""
    import pathlib
    import re

    root = pathlib.Path(__file__).resolve().parent
    best = None
    for p in root.glob("BENCH_r*.json"):
        m = re.search(r"BENCH_r(\d+)\.json$", p.name)
        if not m:
            continue
        try:
            data = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        if isinstance(data, dict) and "parsed" in data:
            data = data["parsed"]  # driver artifact wraps the bench line
        if not isinstance(data, dict) or not data.get("value"):
            continue
        if data.get("extra", {}).get("stale"):
            continue  # don't chain staleness
        if best is None or int(m.group(1)) > best[0]:
            best = (int(m.group(1)), p.name, data)
    return {"source": best[1], **best[2]} if best else None


def main() -> None:
    if not probe_backend():
        # A dead tunnel is a rig outage, not a framework regression: report
        # the last LIVE measurement, clearly labeled stale, so the recorded
        # number stays meaningful. value=0.0 only if no prior artifact.
        prior = _last_live_result()
        err = ("accelerator backend unreachable (remote-TPU tunnel down: "
               "backend init hung past probe timeout)")
        if prior is not None:
            print(json.dumps({
                "metric": prior["metric"], "value": prior["value"],
                "unit": prior["unit"], "vs_baseline": prior["vs_baseline"],
                "extra": {"stale": True, "stale_source": prior["source"],
                          "error": err,
                          **{k: v for k, v in prior.get("extra", {}).items()
                             if k in ("batch", "kv_cache_dtype",
                                      "p50_utterance_latency_s",
                                      "streaming_ttfb_s")}},
            }))
        else:
            print(json.dumps({
                "metric": "rtfx_e2e_30s_b48_decode128", "value": 0.0,
                "unit": "audio_s/s/chip", "vs_baseline": 0.0,
                "extra": {"error": err},
            }))
        return

    import jax

    from tiny_audio_tpu.utils.compile_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()  # TA_JAX_CACHE_DIR overrides
    import jax.numpy as jnp

    from tiny_audio_tpu.config import ASRConfig
    from tiny_audio_tpu.models.asr import ASRModel
    from tiny_audio_tpu.ops import mel

    import os

    cfg = ASRConfig()
    # Serving mode: int8 KV cache by default (halves decode cache bandwidth;
    # greedy-token agreement vs bf16 pinned in tests/test_kv_quant.py and the
    # quantization error is ~0.4% RMS).  TA_BENCH_KV=bfloat16 reverts.
    # Measured on this chip: bf16 588 RTFx / int8 646 RTFx (same TTFB).
    cfg.kv_cache_dtype = os.environ.get("TA_BENCH_KV", "int8")
    t_init0 = time.time()
    model = ASRModel(cfg, seed=0)  # syncs kv_cache_dtype into the decoder
    # Drain param materialization BEFORE the compile clock starts: un-drained
    # init work queued on the device would serialize ahead of the first
    # generate execution and get billed to compile_s (the round-4 driver
    # bench's ~685 s "cold compile" was mostly this; init is now one jitted
    # computation, see ASRModel.init_params).
    jax.block_until_ready(model.params)
    init_s = time.time() - t_init0

    # Serving-throughput batch: decode is weight-read-bound, so batching
    # amortizes the ~1.5 GB/step HBM weight traffic (override with
    # TA_BENCH_BATCH).  Measured sweep on this chip (int8 KV): b32 644 /
    # b48 718 / b64 720 RTFx — 48 is the knee (past it the growing cache
    # reads eat what the weight amortization saves).
    if os.environ.get("TA_WQ_DECODE") == "1":
        # weight-only int8 decode (ops/wq_matmul.py): measures the
        # quantized serving mode end-to-end; primary metric stays bf16
        model.enable_wq_decode()
    if os.environ.get("TA_W8A8_DECODE") == "1":
        # W8A8 decode (layers + head, ops/wq_head.py): the int8 mode
        # measured FASTER than bf16 on this chip; primary metric stays bf16
        model.enable_w8a8_decode()
    batch = int(os.environ.get("TA_BENCH_BATCH", "48"))
    clip_seconds = 30.0
    n_samples = int(clip_seconds * 16000)
    rng = np.random.default_rng(0)
    # Audio as int16 PCM — what real sources deliver — halving host->device
    # bytes; dequantization happens on-device inside the jitted front-end.
    audio_i16 = (
        np.clip(rng.standard_normal((batch, n_samples)) * 0.1, -1, 1) * 32767
    ).astype(np.int16)

    n_frames = n_samples // mel.HOP_LENGTH
    lengths = jnp.asarray(np.full((batch,), n_samples))

    import jax as _jax

    @_jax.jit
    def frontend(pcm_i16, lengths):
        audio = pcm_i16.astype(jnp.float32) / 32768.0
        feats = mel.log_mel_spectrogram(audio, num_mel_bins=cfg.encoder.num_mel_bins)
        return feats, mel.frame_attention_mask(lengths, n_frames)

    def put(x):
        return jax.device_put(x)  # async: overlaps with in-flight compute

    def run_once(device_pcm):
        feats, mask = frontend(device_pcm, lengths)
        tokens = model.generate(feats, mask, mel_length=n_frames)
        return np.asarray(tokens)

    # Drain the first input transfer BEFORE the compile clock.  The tunnel
    # link's throughput is wildly non-stationary (the same 46 MB first copy
    # measured 7 s and 720 s in back-to-back processes, steady-state laps
    # unaffected) — left inside the clock it masquerades as "cold compile"
    # (docs/performance.md, "Where the warm-boot time actually goes").
    t0 = time.time()
    first_batch = put(audio_i16)
    jax.block_until_ready(first_batch)
    transfer_s = time.time() - t0

    # Warmup / compile: trace + (persistent-cache) compile + first execution
    t0 = time.time()
    run_once(first_batch)
    compile_s = time.time() - t0

    # Timed runs with pipelined transfer: batch N+1's host->device copy runs
    # on a background thread while batch N computes (steady-state serving
    # overlap; device_put releases the GIL during the copy).
    from concurrent.futures import ThreadPoolExecutor

    # median over iterations: the host->device link (a tunnel on this test
    # rig) has high run-to-run variance that a mean would smear into the
    # compute measurement
    iters = 5
    laps = []
    with ThreadPoolExecutor(1) as pool:
        pending = pool.submit(put, audio_i16)
        for _ in range(iters):
            current = pending.result()
            pending = pool.submit(put, audio_i16)
            t0 = time.time()
            run_once(current)
            laps.append(time.time() - t0)
    wall = float(np.median(laps))

    rtfx = batch * clip_seconds / wall

    # p50 single-utterance latency (10 s clip, batch 1) — the BASELINE.md
    # "p50 utterance latency tracked" target
    lat_audio = jnp.asarray(audio_i16[:1, : 10 * 16000])
    lat_lengths = jnp.asarray(np.full((1,), 10 * 16000))
    lat_frames = 10 * 16000 // mel.HOP_LENGTH

    @_jax.jit
    def lat_frontend(pcm_i16, lengths):
        a = pcm_i16.astype(jnp.float32) / 32768.0
        f = mel.log_mel_spectrogram(a, num_mel_bins=cfg.encoder.num_mel_bins)
        return f, mel.frame_attention_mask(lengths, lat_frames)

    def one_utterance():
        f, m = lat_frontend(lat_audio, lat_lengths)
        return np.asarray(model.generate(f, m, mel_length=lat_frames))

    t0 = time.time()
    one_utterance()  # compile
    lat_compile_s = time.time() - t0
    lats = []
    for _ in range(5):
        t0 = time.time()
        one_utterance()
        lats.append(time.time() - t0)

    # Streaming TTFB (batch-1 token-by-token path, BASELINE.md latency
    # metric): wall time from mel features to the FIRST TOKEN of the stream.
    # Token-level on purpose: the text-fragment filter upstream is
    # content-dependent (random-weight decodes can open a <think> span and
    # mute fragments for the whole budget).
    from tiny_audio_tpu.generation import stream_generate
    from tiny_audio_tpu.utils.profiling import block_until_ready_via_host

    def first_token_latency():
        f, m = lat_frontend(lat_audio, lat_lengths)
        n_audio = model._num_audio_tokens(lat_frames)
        ids = model.build_prompt_ids(n_audio)
        input_ids = jnp.asarray(np.array(ids, np.int32)[None, :])
        # the async-dispatched mel front-end must FINISH before the clock
        # starts, or TTFB silently absorbs front-end compute
        block_until_ready_via_host((f, m))
        t0 = time.time()
        embeds = model._splice_embeds_jit(model.params, f, m, input_ids)
        for _ in stream_generate(
            model.decoder, model.decoder_variables(),
            embeds, input_ids, model.gen_config,
        ):
            return time.time() - t0
        return time.time() - t0

    t0 = time.time()
    first_token_latency()  # compile prefill + step graphs
    stream_compile_s = time.time() - t0
    ttfbs = [first_token_latency() for _ in range(5)]

    result = {
        "metric": f"rtfx_e2e_30s_b{batch}_decode{cfg.max_new_tokens}",
        "value": round(rtfx, 2),
        "unit": "audio_s/s/chip",
        "vs_baseline": round(rtfx / (TARGET_MULTIPLE * A40_RTFX_ESTIMATE), 3),
        "extra": {
            "batch": batch,
            "wall_s_per_batch": round(wall, 3),
            "compile_s": round(compile_s, 1),
            # param-init materialization (one jitted computation) and the
            # first 46 MB input copy, each drained before the compile clock
            # so neither masquerades as compile
            "init_s": round(init_s, 1),
            "first_transfer_s": round(transfer_s, 1),
            # total first-trace cost across every graph this bench builds
            # (batched generate + batch-1 latency + streaming prefill/step);
            # near-zero on a warm persistent cache (~10 s deserialize)
            "warmup_total_s": round(
                compile_s + lat_compile_s + stream_compile_s, 1
            ),
            "p50_utterance_latency_s": round(float(np.median(lats)), 3),
            "streaming_ttfb_s": round(float(np.median(ttfbs)), 3),
            "kv_cache_dtype": cfg.kv_cache_dtype,
            "wq_decode": model.wq is not None,
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
