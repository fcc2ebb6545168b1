"""Diarization evaluator: DER(collar=0.25) with duration-weighted corpus DER.

Re-designed equivalent of ``/root/reference/scripts/eval/evaluators/
diarization.py:15-411``.  Reference segments come from the dataset rows
(``speakers`` column: list of {speaker,start,end}); hypotheses from the
in-repo :class:`SpeakerDiarizer` (local backend) or any callable producing
segment lists.
"""

from __future__ import annotations

import time
from typing import Iterable, Optional

import numpy as np

from tiny_audio_tpu.eval.der import diarization_error_rate


class DiarizationEvaluator:
    def __init__(self, diarize_fn=None, collar: float = 0.25,
                 model_name: str = "local-diarizer"):
        if diarize_fn is None:
            from tiny_audio_tpu.diarization import SpeakerDiarizer

            diarize_fn = SpeakerDiarizer.diarize
        self.diarize_fn = diarize_fn
        self.collar = collar
        self.model_name = model_name

    @staticmethod
    def extract_reference(sample: dict) -> list[dict]:
        segs = sample.get("speakers") or []
        # accept parallel-array form {"speakers": [...], "timestamps": [[s,e]...]}
        if segs and not isinstance(segs[0], dict):
            ts = sample.get("timestamps") or []
            segs = [
                {"speaker": str(sp), "start": float(t[0]), "end": float(t[1])}
                for sp, t in zip(segs, ts)
            ]
        return segs

    def evaluate(
        self, dataset: Iterable[dict], num_samples: Optional[int] = None,
        verbose: bool = True,
    ) -> tuple[list[dict], dict]:
        results = []
        for i, sample in enumerate(dataset):
            if num_samples and i >= num_samples:
                break
            reference = self.extract_reference(sample)
            if not reference:
                continue
            audio = sample["audio"]
            t0 = time.time()
            try:
                hypothesis = self.diarize_fn(
                    np.asarray(audio["array"], np.float32),
                    sample_rate=int(audio.get("sampling_rate", 16000)),
                )
                error = None
            except Exception as e:
                hypothesis, error = [], str(e)
            metrics = diarization_error_rate(
                reference, hypothesis, collar=self.collar
            )
            metrics["time_s"] = time.time() - t0
            if error:
                metrics["error"] = error
            results.append(metrics)
            if verbose and (i + 1) % 20 == 0:
                print(f"[eval] {i + 1} samples", flush=True)

        return results, self.compute_metrics(results)

    @staticmethod
    def compute_metrics(results: list[dict]) -> dict:
        """Total-duration-weighted corpus DER (reference diarization.py:200-240)."""
        if not results:
            return {"corpus_der": 0.0, "num_samples": 0}
        total = sum(r["total"] for r in results)
        err = sum(r["missed"] + r["false_alarm"] + r["confusion"] for r in results)
        return {
            "corpus_der": 100.0 * err / total if total > 0 else 0.0,
            "avg_der": 100.0 * float(np.mean([
                r["der"] for r in results if np.isfinite(r["der"])
            ])),
            "num_samples": len(results),
            "errors": sum(1 for r in results if "error" in r),
        }
