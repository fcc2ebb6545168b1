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
    def __init__(self, path: str = "", pipeline=None):
        if pipeline is not None:
            self.pipe = pipeline
        else:
            from tiny_audio_tpu.models.asr import ASRModel
            from tiny_audio_tpu.pipeline import ASRPipeline

            self.pipe = ASRPipeline(ASRModel.from_pretrained(path))

    def warmup(self, seconds: float = 3.0) -> None:
        """Trigger jit compilation for the default mel bucket."""
        silent = np.zeros(int(seconds * 16000), np.float32)
        self.pipe(silent)

    def __call__(self, data: dict[str, Any]) -> dict:
        inputs = data.get("inputs")
        if inputs is None:
            return {"error": "missing 'inputs'"}
        parameters: dict = data.get("parameters") or {}
        try:
            return self.pipe(inputs, **parameters)
        except Exception as e:  # serving must not crash on one bad request
            return {"error": str(e)}
