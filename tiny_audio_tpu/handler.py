"""Inference-endpoint handler: the serving entry contract.

Re-designed equivalent of ``/root/reference/tiny_audio/handler.py:15-71``
(HF Inference Endpoints): ``EndpointHandler(path)`` loads the checkpoint
into an :class:`ASRPipeline`; calling it with
``{"inputs": <bytes|array|path>, "parameters": {...}}`` returns the pipeline
result dict.  On TPU the first call compiles per mel-bucket; call
:meth:`warmup` at boot so requests never pay compile latency (the
reference's analogue is device_map/dtype selection at load).
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np


class EndpointHandler:
    def __init__(self, path: str = "", pipeline=None, tp: int = 1,
                 dp: Optional[int] = None, wq_decode: bool = False,
                 w8a8_head: bool = False, w8a8_decode: bool = False):
        """``tp``/``dp``: shard the towers over a (dp, tp) device mesh for
        multi-chip serving (GSPMD over ICI — parallel/mesh.py rules; the
        tp-sharded generate is token-exact vs single-device,
        tests/test_sharded_inference.py).  Defaults stay single-device.

        ``wq_decode``: weight-only int8 decode (ASRModel.enable_wq_decode)
        — halves decode's per-step HBM weight traffic at a small
        quantization quality trade; also enabled by ``TA_WQ_DECODE=1``.

        ``w8a8_head``: int8 x int8 LM head for decode logits
        (ASRModel.enable_w8a8_head) — measured 22% faster than the bf16
        head dot (ops/wq_head.py); also enabled by ``TA_W8A8_HEAD=1``.

        ``w8a8_decode``: W8A8 for ALL T==1 matmuls — layer projections
        AND the head (ASRModel.enable_w8a8_decode; supersedes the two
        flags above) — measured 20%/22% faster than the bf16 matvecs
        (scripts/bench_w8a8_decode.py); also ``TA_W8A8_DECODE=1``."""
        from tiny_audio_tpu.utils.compile_cache import (
            enable_persistent_compile_cache,
        )

        enable_persistent_compile_cache()
        if pipeline is not None:
            self.pipe = pipeline
        else:
            from tiny_audio_tpu.models.asr import ASRModel
            from tiny_audio_tpu.pipeline import ASRPipeline

            self.pipe = ASRPipeline(ASRModel.from_pretrained(path))
        import os

        if wq_decode or os.environ.get("TA_WQ_DECODE") == "1":
            if tp > 1 or (dp or 1) > 1:
                # the wq collection is host-built and unsharded; under a
                # mesh the Pallas call would force all-gathers of the tp-
                # sharded activations — sharded serving keeps bf16 decode
                print("[handler] --wq-decode ignored under --tp/--dp "
                      "(wq weights are unsharded; mesh serving stays bf16)")
            else:
                self.pipe.model.enable_wq_decode()
        if w8a8_head or os.environ.get("TA_W8A8_HEAD") == "1":
            if tp > 1 or (dp or 1) > 1:
                print("[handler] --w8a8-head ignored under --tp/--dp "
                      "(head_t_i8 is unsharded; mesh serving stays bf16)")
            else:
                self.pipe.model.enable_w8a8_head()
        if w8a8_decode or os.environ.get("TA_W8A8_DECODE") == "1":
            if tp > 1 or (dp or 1) > 1:
                print("[handler] --w8a8-decode ignored under --tp/--dp "
                      "(the wq collection is unsharded; mesh serving "
                      "stays bf16)")
            else:
                self.pipe.model.enable_w8a8_decode()
        self.mesh = None
        if tp > 1 or (dp or 1) > 1:
            import jax

            from tiny_audio_tpu.parallel.mesh import make_mesh, shard_params

            # serving default dp=1: use exactly dp*tp chips (a lone server
            # should not silently claim every chip on the host for dp)
            dp = dp or 1
            self.mesh = make_mesh(
                dp=dp, tp=tp, devices=jax.devices()[: dp * tp]
            )
            # no mesh context needed anywhere (jax.set_mesh is thread-local
            # and HTTP/batcher/engine threads all run pipeline calls): the
            # params' NamedShardings carry the mesh, and GSPMD propagates
            # layouts from them through every jitted graph
            self.pipe.model.params = shard_params(
                self.pipe.model.params, self.mesh
            )

    def warmup(self, seconds: Optional[float] = None,
               longform: bool = True, batched: bool = False,
               log=print) -> float:
        """AOT-compile the serving graphs at boot; returns total seconds.

        Without ``seconds``, compiles EVERY mel bucket (each bucket is a
        distinct jit shape — on this chip a cold bucket costs tens of
        seconds of compile, and the persistent cache only helps across
        restarts) plus, when ``longform``, every chunked-batch bucket
        (2/4/8 full chunks) that >30 s inputs dispatch to.  With
        ``batched`` (dynamic request batching enabled), also compiles the
        transcribe_batch BATCH_BUCKETS per mel bucket — a cold batch shape
        at request time stalls every coalesced request (and, through the
        shared lock, solo requests) behind a minutes-long compile.  With
        ``seconds``, compiles just that one bucket (the round-1 behavior).

        Per-graph wall seconds are reported through ``log`` (pass
        ``lambda *_: None`` to silence); on a warm persistent cache each
        graph logs ~a second (deserialize + layout), not minutes.
        """
        import time

        from tiny_audio_tpu.ops import mel

        total = 0.0

        def _compile(desc: str, fn) -> None:
            nonlocal total
            t0 = time.time()
            fn()
            dt = time.time() - t0
            total += dt
            log(f"[warmup] {desc}: {dt:.1f}s")

        if seconds is not None:
            _compile(f"solo {seconds:g}s",
                     lambda: self.pipe(np.zeros(int(seconds * 16000),
                                                np.float32)))
            return total
        buckets = getattr(self.pipe.processor, "mel_buckets", (3000,))
        prev = 0
        for frames in buckets:
            # Two lengths per mel bucket — its bottom and top — because the
            # generate graph is ALSO keyed on the PROMPT_BUCKET the real
            # audio-token count falls in (models/asr.py): a mel bucket's
            # token range spans at most two prompt buckets (bucket step /
            # 8 frames-per-token < 64), so warming both ends covers every
            # shape the bucket can dispatch.  The duplicate case is a
            # cheap warm re-run.
            lengths = sorted({(prev + 1) * mel.HOP_LENGTH,
                              frames * mel.HOP_LENGTH})
            prev = frames
            for n in lengths:
                _compile(f"solo bucket {frames}f ({n / 16000:.1f}s)",
                         lambda n=n: self.pipe(np.zeros(n, np.float32)))
                if batched:
                    for rows in self.pipe.BATCH_BUCKETS[1:]:  # 1 == solo
                        _compile(
                            f"batch bucket {frames}f x{rows} "
                            f"({n / 16000:.1f}s)",
                            lambda n=n, rows=rows:
                            self.pipe.transcribe_batch(
                                [np.zeros(n, np.float32)] * rows
                            ),
                        )
        if longform:
            # The pipeline pads chunk groups to power-of-2 batch buckets,
            # so 2/4/8 full-chunk inputs compile EVERY longform generate
            # shape (batch-1 is the regular bucket warmup above).
            for nchunks in (2, 4, 8):
                _compile(
                    f"longform {nchunks}-chunk",
                    lambda nchunks=nchunks: self.pipe(
                        np.zeros(nchunks * 3000 * mel.HOP_LENGTH, np.float32)
                    ),
                )
        log(f"[warmup] total: {total:.1f}s")
        return total

    def __call__(self, data: dict[str, Any]) -> dict:
        inputs = data.get("inputs")
        if inputs is None:
            return {"error": "missing 'inputs'"}
        parameters: dict = data.get("parameters") or {}
        try:
            return self.pipe(inputs, **parameters)
        except Exception as e:  # serving must not crash on one bad request
            return {"error": f"{type(e).__name__}: {e}"}
