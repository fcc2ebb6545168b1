"""Regression gates for the offline quality benchmarks
(scripts/bench_quality.py): alignment median-AE and synthetic-conversation
DER are TRACKED numbers, not just computed ones (VERDICT r2 weak-#3).

Thresholds are set from measured values with headroom (alignment median AE
25.2 ms / p90 61 ms measured 2026-08-17; corpus DER 13.3-16.8% across seeds
on the 10-condition grid measured 2026-08-18 — see
docs/evaluation-and-deployment.md for the current table).  A regression
past these gates means the trellis/grouping chain or the diarization stack
materially degraded.
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

        metrics = mod.bench_diarization(n=10, seed=7)
        assert metrics["num_samples"] == 10
        assert metrics["errors"] == 0
        assert np.isfinite(metrics["corpus_der"])
        # Measured ladder on the 10-condition grid (2026-08-18, trained VAD
        # + synthetic-tier embedder): corpus DER 13.3% seed 7 / 16.8% seed 0
        # / 14.7% seed 3 / 15.6% seed 42 — the hard tier (close voices, 40%
        # overlap, sub-second turns, 6 speakers, far-field+8 dB) was sized
        # to land in the 5-20% range where regressions are VISIBLE
        # (VERDICT r3 #3: the old grid saturated at 0.19%).  Gate by tier
        # so a missing weights file degrades to the looser bound instead of
        # a spurious failure.
        if metrics.get("ecapa_tier") in ("synthetic", "speechbrain"):
            assert metrics["corpus_der"] <= 25.0, metrics
            # the easy tier must stay solved — a clean-condition regression
            # hides inside a corpus number dominated by the hard tier
            assert metrics["per_condition_der"]["clean-2spk"] <= 5.0, metrics
            assert metrics["per_condition_der"]["clean-3spk"] <= 5.0, metrics
        else:
            assert metrics["corpus_der"] <= 75.0, metrics

    def test_der_stable_across_seeds(self):
        """The gated seed must not be a lucky one.  Before the normalized-
        Laplacian ratio-gap estimator + split refinement, seed 0 scored
        33.4% corpus DER (eigengap over-split to 8 speakers) while seed 7
        scored 0.12% on the old easy grid.  Measured on the 10-condition
        grid (2026-08-18): seeds 0/3/42 at 16.8%/14.7%/15.6%."""
        from tiny_audio_tpu.eval.datasets import _synthetic_conversation_rows
        from tiny_audio_tpu.eval.evaluators.diarization import (
            DiarizationEvaluator,
        )
        from tiny_audio_tpu.diarization import EcapaEmbedder

        if getattr(EcapaEmbedder.get(), "tier", "random") == "random":
            pytest.skip("no trained embedder weights checked in")
        for seed in (0, 42):
            rows = _synthetic_conversation_rows(10, seed)
            _, metrics = DiarizationEvaluator().evaluate(rows, verbose=False)
            assert metrics["errors"] == 0, (seed, metrics)
            assert metrics["corpus_der"] <= 25.0, (seed, metrics)

    def test_rows_are_well_formed(self):
        from tiny_audio_tpu.eval.datasets import _synthetic_conversation_rows

        rows = _synthetic_conversation_rows(10, seed=3)
        assert len(rows) == 10
        conditions = {r["condition"] for r in rows}
        assert len(conditions) == 10  # grid cycles all conditions
        assert sum(c.startswith("hard-") for c in conditions) == 5
        for r in rows:
            audio = r["audio"]["array"]
            assert audio.dtype == np.float32
            assert np.max(np.abs(audio)) <= 1.0
            assert len(r["speakers"]) >= 2
            for seg in r["speakers"]:
                assert 0.0 <= seg["start"] < seg["end"]
