"""Regression gates for the offline quality benchmarks
(scripts/bench_quality.py): alignment median-AE and synthetic-conversation
DER are TRACKED numbers, not just computed ones (VERDICT r2 weak-#3).

Thresholds are set from measured values with headroom (measured 2026-08-17:
alignment median AE 25.2 ms / p90 61 ms; corpus DER 48.6% with random-init
ECAPA + heuristic VAD — see docs/evaluation-and-deployment.md for the
current table).  A regression past these gates means the trellis/grouping
chain or the diarization stack materially degraded.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow


class TestAlignmentBenchmark:
    def test_median_ae_under_40ms(self):
        import importlib.util
        from pathlib import Path

        spec = importlib.util.spec_from_file_location(
            "bench_quality",
            Path(__file__).resolve().parents[1] / "scripts" / "bench_quality.py",
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)

        metrics = mod.bench_alignment(n=12)
        assert metrics["median_ae_ms"] <= 40.0, metrics
        assert metrics["p90_ae_ms"] <= 120.0, metrics


class TestDiarizationBenchmark:
    def test_synthetic_conversation_der_tracked(self):
        import importlib.util
        from pathlib import Path

        spec = importlib.util.spec_from_file_location(
            "bench_quality",
            Path(__file__).resolve().parents[1] / "scripts" / "bench_quality.py",
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)

        metrics = mod.bench_diarization(n=5, seed=7)
        assert metrics["num_samples"] == 5
        assert metrics["errors"] == 0
        assert np.isfinite(metrics["corpus_der"])
        # Measured ladder (2026-08-17): random ECAPA + heuristic VAD 48.6%;
        # trained VAD + 1200-step embedder ~23%; shipped trained VAD +
        # 3500-step embedder 0.12%.  Gate by tier so a missing weights file
        # degrades to the looser bound instead of a spurious failure.
        if metrics.get("ecapa_tier") in ("synthetic", "speechbrain"):
            assert metrics["corpus_der"] <= 10.0, metrics
        else:
            assert metrics["corpus_der"] <= 65.0, metrics

    def test_der_stable_across_seeds(self):
        """The gated seed must not be a lucky one.  Before the normalized-
        Laplacian ratio-gap estimator + split refinement, seed 0 scored
        33.4% corpus DER (eigengap over-split to 8 speakers) while seed 7
        scored 0.12%.  Measured after (2026-08-17): seeds 0/42 at 0.28%/
        0.51%, 5-seed mean 0.19%."""
        from tiny_audio_tpu.eval.datasets import _synthetic_conversation_rows
        from tiny_audio_tpu.eval.evaluators.diarization import (
            DiarizationEvaluator,
        )
        from tiny_audio_tpu.diarization import EcapaEmbedder

        if getattr(EcapaEmbedder.get(), "tier", "random") == "random":
            pytest.skip("no trained embedder weights checked in")
        for seed in (0, 42):
            rows = _synthetic_conversation_rows(4, seed)
            _, metrics = DiarizationEvaluator().evaluate(rows, verbose=False)
            assert metrics["errors"] == 0, (seed, metrics)
            assert metrics["corpus_der"] <= 5.0, (seed, metrics)

    def test_rows_are_well_formed(self):
        from tiny_audio_tpu.eval.datasets import _synthetic_conversation_rows

        rows = _synthetic_conversation_rows(5, seed=3)
        assert len(rows) == 5
        conditions = {r["condition"] for r in rows}
        assert len(conditions) == 5  # grid cycles all conditions
        for r in rows:
            audio = r["audio"]["array"]
            assert audio.dtype == np.float32
            assert np.max(np.abs(audio)) <= 1.0
            assert len(r["speakers"]) >= 2
            for seg in r["speakers"]:
                assert 0.0 <= seg["start"] < seg["end"]
