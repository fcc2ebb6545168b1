"""Loaded serving throughput: dynamic batching vs lock-serialized solo.

Starts the real HTTP server on the flagship-size model (random weights —
throughput is weight-value-independent), fires N concurrent 10 s clips, and
reports requests/s + audio-seconds/s for both modes.  This is the measured
justification for serving.py's dynamic batcher (docs/evaluation-and-
deployment.md).

Run on the TPU host:  python scripts/bench_serving.py
"""
import json
import threading
import time
import urllib.request

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from tiny_audio_tpu.batching import DynamicBatcher  # noqa: E402
from tiny_audio_tpu.config import ASRConfig  # noqa: E402
from tiny_audio_tpu.handler import EndpointHandler  # noqa: E402
from tiny_audio_tpu.models.asr import ASRModel  # noqa: E402
from tiny_audio_tpu.pipeline import ASRPipeline  # noqa: E402
from tiny_audio_tpu.serving import make_server  # noqa: E402

CLIP_S = 10.0
N_REQ = 48
CONCURRENCY = 16


def fire(port: int, clip: bytes, n: int, concurrency: int) -> float:
    sem = threading.Semaphore(concurrency)
    errs = []

    def one():
        with sem:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/transcribe", data=clip,
                headers={"Content-Type": "application/pcm-f32"},
            )
            try:
                with urllib.request.urlopen(req, timeout=600) as r:
                    json.loads(r.read())
            except Exception as e:  # pragma: no cover
                errs.append(e)

    threads = [threading.Thread(target=one) for _ in range(n)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    if errs:
        raise RuntimeError(f"{len(errs)} request errors, first: {errs[0]}")
    return wall


def main() -> None:
    cfg = ASRConfig()
    cfg.max_new_tokens = 128
    cfg.kv_cache_dtype = "int8"
    model = ASRModel(cfg, seed=0)
    pipe = ASRPipeline(model)
    handler = EndpointHandler(pipeline=pipe)

    rng = np.random.default_rng(0)
    clip = np.clip(rng.standard_normal(int(CLIP_S * 16000)) * 0.1, -1, 1
                   ).astype(np.float32).tobytes()

    results = {}
    for mode in ("batched", "solo"):
        batcher = (
            DynamicBatcher(pipe, max_batch=16, max_wait_ms=25)
            if mode == "batched" else None
        )
        server = make_server(handler, host="127.0.0.1", port=0,
                             batcher=batcher)
        port = server.server_address[1]
        st = threading.Thread(target=server.serve_forever, daemon=True)
        st.start()
        # warm every shape this mode will hit, from the MAIN thread, before
        # timing (each cold batch bucket compiles for minutes)
        arr = np.frombuffer(clip, np.float32)
        if batcher is not None:
            for bucket in ASRPipeline.BATCH_BUCKETS:
                print(f"[warm] batch bucket {bucket}", flush=True)
                pipe.transcribe_batch([arr] * bucket)
        else:
            pipe(arr)
        fire(port, clip, 4, 4)
        wall = fire(port, clip, N_REQ, CONCURRENCY)
        server.shutdown()
        if batcher is not None:
            batcher.close()
        results[mode] = {
            "req_per_s": round(N_REQ / wall, 2),
            "audio_s_per_s": round(N_REQ * CLIP_S / wall, 1),
            "wall_s": round(wall, 2),
        }
        print(mode, results[mode], flush=True)

    speedup = results["batched"]["req_per_s"] / results["solo"]["req_per_s"]
    print(json.dumps({
        "metric": "serving_loaded_speedup_batched_vs_solo",
        "value": round(speedup, 2),
        "unit": "x",
        "detail": results,
    }))


if __name__ == "__main__":
    main()
