"""Eval harness: registry, base loop, DER, LCS alignment, MCQ matching,
classification keyword spotting, results writers, CLI dispatch, analysis
parsers, debug tools, hub staging."""

import numpy as np
import pytest

from tiny_audio_tpu.eval.datasets import (
    ALL_GROUPS,
    DATASET_REGISTRY,
    load_eval_dataset,
    validate_datasets,
)
from tiny_audio_tpu.eval.der import diarization_error_rate
from tiny_audio_tpu.eval.evaluators.alignment import AlignmentEvaluator, lcs_match
from tiny_audio_tpu.eval.evaluators.base import Evaluator, should_skip_reference
from tiny_audio_tpu.eval.evaluators.classification import (
    ClassificationEvaluator,
    canonicalize,
    extract_classes,
)
from tiny_audio_tpu.eval.evaluators.diarization import DiarizationEvaluator
from tiny_audio_tpu.eval.evaluators.mcq import MCQEvaluator, build_mcq_prompt, match_choice


class TestRegistry:
    def test_registry_has_all_types(self):
        types = {d.dataset_type for d in DATASET_REGISTRY.values()}
        assert types == {"asr", "diarization", "alignment", "mcq", "classification"}
        assert len(DATASET_REGISTRY) >= 25

    def test_validate_expands_all(self):
        names = validate_datasets(["all"])
        assert names == ALL_GROUPS["all"]

    def test_validate_unknown_raises(self):
        with pytest.raises(ValueError, match="unknown dataset"):
            validate_datasets(["nope"])

    def test_synthetic_rows(self):
        rows = load_eval_dataset("synthetic", num_samples=4)
        assert len(rows) == 4 and rows[0]["text"]

    def test_synthetic_alignment_rows_have_words(self):
        rows = load_eval_dataset("synthetic-alignment", num_samples=2)
        assert rows[0]["words"][0]["end"] > rows[0]["words"][0]["start"]


class _EchoEvaluator(Evaluator):
    """Returns the reference text (WER 0) or a fixed error."""

    def __init__(self, fail_on=frozenset()):
        super().__init__("echo")
        self.fail_on = fail_on

    def transcribe(self, audio, sample):
        if sample["text"] in self.fail_on:
            raise RuntimeError("boom")
        return sample["text"]


class TestBaseEvaluator:
    def _rows(self, texts):
        return [{"audio": {"array": np.zeros(160)}, "text": t} for t in texts]

    def test_perfect_wer(self):
        results, metrics = _EchoEvaluator().evaluate(self._rows(["a b c", "d e"]))
        assert metrics["corpus_wer"] == 0.0 and metrics["num_samples"] == 2

    def test_skip_markers(self):
        rows = self._rows(["keep", "ignore_time_segment_in_scoring", ""])
        results, metrics = _EchoEvaluator().evaluate(rows)
        assert metrics["num_samples"] == 1

    def test_errors_counted_not_fatal(self):
        rows = self._rows(["good", "bad"])
        results, metrics = _EchoEvaluator(fail_on={"bad"}).evaluate(rows)
        assert metrics["errors"] == 1 and metrics["num_samples"] == 2

    def test_parallel_matches_sequential(self):
        rows = self._rows([f"sample {i}" for i in range(8)])
        _, seq = _EchoEvaluator().evaluate(rows)
        ev = _EchoEvaluator()
        ev.num_workers = 4
        _, par = ev.evaluate(rows)
        assert seq["corpus_wer"] == par["corpus_wer"]
        assert seq["num_samples"] == par["num_samples"]

    def test_should_skip(self):
        assert should_skip_reference("")
        assert should_skip_reference("has <inaudible> part")
        assert not should_skip_reference("fine")

    def test_normalizer_emptied_reference_skipped(self):
        """'mm-hmm'/'***' normalize to ''; align_counts([], hyp) is inf WER,
        which must not poison avg_sample_wer (regression)."""
        rows = self._rows(["a b c", "mm-hmm", "***"])
        results, metrics = _EchoEvaluator().evaluate(rows)
        assert metrics["num_samples"] == 1
        assert np.isfinite(metrics["avg_sample_wer"])

    def test_lazy_iteration_respects_num_samples(self):
        """The dataset is consumed lazily: with num_samples=2 a streaming
        source must not be drained (regression: everything was materialized
        into RAM up front)."""
        consumed = []

        def gen():
            for i in range(1000):
                consumed.append(i)
                yield {"audio": {"array": np.zeros(160)}, "text": f"t {i}"}

        _, metrics = _EchoEvaluator().evaluate(gen(), num_samples=2)
        assert metrics["num_samples"] == 2
        assert len(consumed) <= 3  # islice stops at the cap

    def test_parallel_lazy_windows(self):
        consumed = []

        def gen():
            for i in range(500):
                consumed.append(i)
                yield {"audio": {"array": np.zeros(160)}, "text": f"t {i}"}

        ev = _EchoEvaluator()
        ev.num_workers = 4
        _, metrics = ev.evaluate(gen(), num_samples=8)
        assert metrics["num_samples"] == 8
        assert len(consumed) <= 24  # one bounded window, not the full source


class TestDER:
    REF = [
        {"speaker": "A", "start": 0.0, "end": 5.0},
        {"speaker": "B", "start": 5.0, "end": 10.0},
    ]

    def test_perfect(self):
        hyp = [
            {"speaker": "X", "start": 0.0, "end": 5.0},
            {"speaker": "Y", "start": 5.0, "end": 10.0},
        ]
        m = diarization_error_rate(self.REF, hyp)
        assert m["der"] == 0.0

    def test_label_permutation_invariant(self):
        hyp = [
            {"speaker": "Y", "start": 0.0, "end": 5.0},
            {"speaker": "X", "start": 5.0, "end": 10.0},
        ]
        assert diarization_error_rate(self.REF, hyp)["der"] == 0.0

    def test_missed_speech(self):
        hyp = [{"speaker": "X", "start": 0.0, "end": 5.0}]
        m = diarization_error_rate(self.REF, hyp, collar=0.0)
        assert m["missed"] == pytest.approx(5.0, abs=0.05)
        assert m["der"] == pytest.approx(0.5, abs=0.01)

    def test_confusion_single_cluster(self):
        hyp = [{"speaker": "X", "start": 0.0, "end": 10.0}]
        m = diarization_error_rate(self.REF, hyp, collar=0.0)
        assert m["confusion"] == pytest.approx(5.0, abs=0.05)

    def test_collar_forgives_boundary_jitter(self):
        hyp = [
            {"speaker": "X", "start": 0.0, "end": 5.2},
            {"speaker": "Y", "start": 5.2, "end": 10.0},
        ]
        assert diarization_error_rate(self.REF, hyp, collar=0.25)["der"] == 0.0
        assert diarization_error_rate(self.REF, hyp, collar=0.0)["der"] > 0.0

    def test_empty_reference(self):
        m = diarization_error_rate([], [{"speaker": "X", "start": 0, "end": 1}])
        assert m["der"] == float("inf")

    def test_evaluator_on_synthetic(self):
        rows = load_eval_dataset("synthetic-diarization", num_samples=2)
        ev = DiarizationEvaluator(
            diarize_fn=lambda audio, sample_rate=16000: [
                {"speaker": "S0", "start": 0.0, "end": len(audio) / sample_rate}
            ]
        )
        results, metrics = ev.evaluate(rows, verbose=False)
        assert metrics["num_samples"] == 2
        assert np.isfinite(metrics["corpus_der"])


class TestAlignment:
    def test_lcs_basic(self):
        pairs = lcs_match(["a", "x", "b", "c"], ["a", "b", "c"])
        assert pairs == [(0, 0), (2, 1), (3, 2)]

    def test_median_error(self):
        ref = [{"word": "hi", "start": 1.0, "end": 2.0}]
        pred = [{"word": "hi", "start": 1.1, "end": 2.05}]
        ev = AlignmentEvaluator(align_fn=None)
        deltas = ev.sample_deltas(pred, ref)
        assert deltas == pytest.approx([0.1, 0.05])

    def test_evaluator_perfect_alignment(self):
        rows = load_eval_dataset("synthetic-alignment", num_samples=2)
        ev = AlignmentEvaluator(align_fn=lambda audio, sample: sample["words"])
        _, metrics = ev.evaluate(rows, verbose=False)
        assert metrics["median_abs_error_s"] == 0.0
        assert metrics["match_rate"] == 1.0


class TestMCQ:
    CHOICES = ["a dog barking", "piano music", "rain falling", "a car engine"]

    def test_prompt_contains_choices(self):
        p = build_mcq_prompt("What do you hear?", self.CHOICES)
        assert "(A) a dog barking" in p and "A/B/C/D" in p

    @pytest.mark.parametrize(
        "pred,expected",
        [
            ("piano music", 1),
            ("(C)", 2),
            ("B", 1),
            ("The answer is D.", 3),
            ("I think it's rain falling outside", 2),
            ("no idea", None),
        ],
    )
    def test_match_choice(self, pred, expected):
        assert match_choice(pred, self.CHOICES) == expected

    def test_evaluator_accuracy(self):
        rows = [
            {"audio": {}, "question": "q", "choices": self.CHOICES,
             "answer": "piano music", "task": "music"},
            {"audio": {}, "question": "q", "choices": self.CHOICES,
             "answer": "rain falling", "task": "env"},
        ]
        ev = MCQEvaluator(lambda audio, prompt: "(B)")
        _, metrics = ev.evaluate(rows, verbose=False)
        assert metrics["accuracy"] == 50.0
        assert metrics["accuracy_music"] == 100.0


class TestClassification:
    def test_canonicalize_synonyms(self):
        assert canonicalize("joy", "emotion") == "happy"
        assert canonicalize("man", "gender") == "male"

    def test_extract_classes(self):
        assert extract_classes("the speaker sounds angry and sad", "emotion") == {
            "angry", "sad",
        }

    def test_evaluator(self):
        rows = [
            {"audio": {}, "label": "happiness"},
            {"audio": {}, "label": "sad"},
        ]
        ev = ClassificationEvaluator(
            lambda audio, prompt: "the speaker sounds happy", task="emotion"
        )
        _, metrics = ev.evaluate(rows, verbose=False)
        assert metrics["accuracy"] == 50.0


class TestResultsIO:
    def test_writer_parser_roundtrip(self, tmp_path):
        from tiny_audio_tpu.analysis import parse_results_file
        from tiny_audio_tpu.eval.cli import save_asr_results
        from tiny_audio_tpu.eval.evaluators.base import EvalResult

        results = [
            EvalResult("hello world", "hello word", 50.0),
            EvalResult("good", "good", 0.0),
        ]
        out = save_asr_results("m/x", "ds", results,
                               {"corpus_wer": 25.0}, str(tmp_path))
        rows = parse_results_file(out / "results.txt")
        assert len(rows) == 2
        assert rows[0]["wer"] == 50.0
        assert rows[0]["ground_truth"] == "hello world"

    def test_high_wer_filter(self, tmp_path):
        from tiny_audio_tpu.analysis import high_wer
        from tiny_audio_tpu.eval.cli import save_asr_results
        from tiny_audio_tpu.eval.evaluators.base import EvalResult

        out = save_asr_results(
            "m", "d",
            [EvalResult("a", "b", 100.0), EvalResult("c", "c", 0.0)],
            {}, str(tmp_path),
        )
        rows = high_wer(out / "results.txt", threshold=50.0)
        assert len(rows) == 1 and rows[0]["wer"] == 100.0

    def test_entity_extraction(self):
        from tiny_audio_tpu.analysis import extract_entities

        ents = extract_entities("he paid twenty dollars on friday at 3:00")
        labels = {lb for lb, _ in ents}
        assert {"CARDINAL", "MONEY", "DATE", "TIME"} <= labels

    def test_compare_models(self, tmp_path):
        from tiny_audio_tpu.analysis import compare_models
        from tiny_audio_tpu.eval.cli import save_asr_results
        from tiny_audio_tpu.eval.evaluators.base import EvalResult

        a = save_asr_results("a", "d", [EvalResult("x y", "x y", 0.0)], {},
                             str(tmp_path / "a"))
        b = save_asr_results("b", "d", [EvalResult("x y", "x z", 50.0)], {},
                             str(tmp_path / "b"))
        cmp = compare_models(a / "results.txt", b / "results.txt")
        assert cmp["num_common"] == 1
        assert cmp["rows"][0]["delta"] == -50.0


@pytest.mark.slow
class TestLocalEvalEndToEnd:
    def test_local_evaluator_synthetic(self, tmp_path):
        from tiny_audio_tpu.config import tiny_test_config
        from tiny_audio_tpu.eval.cli import run_eval
        from tiny_audio_tpu.models.asr import ASRModel

        model = ASRModel(tiny_test_config(model_dtype="float32"), seed=0)
        model.save_pretrained(tmp_path / "ckpt")
        metrics = run_eval(
            str(tmp_path / "ckpt"), "synthetic", num_samples=2,
            output_dir=str(tmp_path / "out"),
        )
        assert metrics["num_samples"] == 2
        assert np.isfinite(metrics["corpus_wer"])

    def test_cli_parses(self):
        from tiny_audio_tpu.cli import build_parser

        parser = build_parser()
        args = parser.parse_args(
            ["eval", "-m", "x", "-d", "synthetic", "-n", "2"]
        )
        assert args.model == "x" and args.datasets == ["synthetic"]
        args = parser.parse_args(["debug", "check-moe", "-m", "x"])
        assert args.debug_cmd == "check-moe"
        args = parser.parse_args(["push", "-m", "ckpt"])
        assert args.model == "ckpt"
        args = parser.parse_args(
            ["transcribe", "-m", "ckpt", "a.wav", "b.wav", "--timestamps"]
        )
        assert args.files == ["a.wav", "b.wav"] and args.timestamps

    def test_cli_transcribe_end_to_end(self, tmp_path):
        """`ta transcribe` on a saved tiny checkpoint + a real wav file."""
        from tiny_audio_tpu.cli import build_parser
        from tiny_audio_tpu.config import tiny_test_config
        from tiny_audio_tpu.models.asr import ASRModel
        from tiny_audio_tpu.utils.audio_io import write_wav

        model = ASRModel(tiny_test_config(model_dtype="float32"), seed=0)
        model.save_pretrained(tmp_path / "ckpt")
        wav = tmp_path / "u.wav"
        rng = np.random.default_rng(0)
        write_wav(wav, (rng.standard_normal(8000) * 0.1).astype(np.float32),
                  16000)
        parser = build_parser()
        args = parser.parse_args(
            ["transcribe", "-m", str(tmp_path / "ckpt"), str(wav), "--json"]
        )
        assert args.func(args) == 0


class TestDebugTools:
    @pytest.fixture(scope="class")
    def moe_model(self):
        from tiny_audio_tpu.config import tiny_test_config
        from tiny_audio_tpu.models.asr import ASRModel

        return ASRModel(
            tiny_test_config(projector_type="moe", model_dtype="float32"), seed=0
        )

    def test_router_health(self, moe_model):
        from tiny_audio_tpu.debug import check_router_health

        report = check_router_health(moe_model, seconds=1.0)
        assert 0.0 <= report["normalized_entropy"] <= 1.0
        assert len(report["per_expert_usage"]) == moe_model.config.num_experts
        assert isinstance(report["collapsed"], bool)

    def test_router_health_rejects_mlp(self):
        from tiny_audio_tpu.config import tiny_test_config
        from tiny_audio_tpu.debug import check_router_health
        from tiny_audio_tpu.models.asr import ASRModel

        m = ASRModel(tiny_test_config(model_dtype="float32"), seed=0)
        with pytest.raises(ValueError):
            check_router_health(m)

    def test_gradient_flow(self, moe_model):
        from tiny_audio_tpu.debug import check_gradient_flow

        report = check_gradient_flow(moe_model)
        assert report["ok"], report["problems"]
        assert report["module_grad_norms"]["projector"] > 0

    def test_analyze_weights(self, moe_model):
        from tiny_audio_tpu.debug import analyze_weights

        report = analyze_weights(moe_model.params)
        assert set(report) == {"encoder", "decoder", "projector"}
        assert report["decoder"]["nonfinite"] == 0

    def test_analyze_lora(self):
        from tiny_audio_tpu.config import tiny_test_config
        from tiny_audio_tpu.debug import analyze_lora
        from tiny_audio_tpu.models.asr import ASRModel

        m = ASRModel(
            tiny_test_config(use_lora=True, lora_rank=4, model_dtype="float32"),
            seed=0,
        )
        report = analyze_lora(m.params)
        assert report and all(v["b_is_zero"] for v in report.values())

    def test_compare_to_base(self, moe_model):
        from tiny_audio_tpu.debug import compare_to_base

        import jax

        params_b = jax.tree_util.tree_map(lambda x: x, moe_model.params)
        params_b["projector"]["router"]["kernel"] = (
            params_b["projector"]["router"]["kernel"] + 1.0
        )
        report = compare_to_base(moe_model.params, params_b)
        assert any("router" in k for k in report)


class TestHubStaging:
    def test_stage_artifact_self_contained(self, tmp_path):
        from tiny_audio_tpu.config import tiny_test_config
        from tiny_audio_tpu.hub import stage_artifact
        from tiny_audio_tpu.models.asr import ASRModel

        model = ASRModel(tiny_test_config(model_dtype="float32"), seed=0)
        model.save_pretrained(tmp_path)
        out = stage_artifact(tmp_path)
        assert (out / "tiny_audio_tpu" / "models" / "asr.py").exists()
        assert (out / "tiny_audio_tpu" / "__init__.py").exists()
        assert (out / ".gitattributes").exists()
        assert (out / "README.md").exists()

    def test_stage_requires_checkpoint(self, tmp_path):
        from tiny_audio_tpu.hub import stage_artifact

        with pytest.raises(FileNotFoundError):
            stage_artifact(tmp_path)

    def test_artifact_closure_covers_runtime_imports(self):
        """Every in-package import reachable from the serving entry points
        must be staged (regression: a hand-kept list missed
        encoder_attention/wav2vec2/ctc/ecapa/native, so the 'self-contained'
        artifact crashed at import)."""
        from tiny_audio_tpu.hub import artifact_modules

        mods = artifact_modules()
        for required in (
            "ops/encoder_attention.py", "models/wav2vec2.py", "ops/ctc.py",
            "models/ecapa.py", "native.py", "ops/fused_decode.py",
            "ops/decode_attention.py", "batching.py", "serving.py",
        ):
            assert required in mods, required

    @pytest.mark.slow
    def test_staged_artifact_imports_standalone(self, tmp_path):
        """The REAL contract: the staged package must import with the repo
        absent from sys.path (subprocess rooted at the artifact)."""
        import subprocess
        import sys

        from tiny_audio_tpu.config import tiny_test_config
        from tiny_audio_tpu.hub import stage_artifact
        from tiny_audio_tpu.models.asr import ASRModel

        model = ASRModel(tiny_test_config(model_dtype="float32"), seed=0)
        model.save_pretrained(tmp_path)
        out = stage_artifact(tmp_path)
        code = (
            "import tiny_audio_tpu.pipeline, tiny_audio_tpu.serving, "
            "tiny_audio_tpu.batching, tiny_audio_tpu.alignment, "
            "tiny_audio_tpu.diarization, tiny_audio_tpu.handler; "
            "print('artifact-ok')"
        )
        env = {"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
               "HOME": str(tmp_path)}
        proc = subprocess.run(
            [sys.executable, "-c", code], cwd=out, env=env,
            capture_output=True, text=True, timeout=300,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert "artifact-ok" in proc.stdout


class TestReviewRegressions:
    """Pinned regressions from the round-1 code review."""

    def test_mcq_article_not_letter_answer(self):
        choices = ["a dog barking", "piano music", "rain falling", "a car engine"]
        # free text containing the article "a" must match by substring,
        # not be misread as choice A
        assert match_choice("It is a dog barking", choices) == 0  # substring
        assert match_choice("maybe rain falling outside", choices) == 2
        assert match_choice("i think it is piano music", choices) == 1

    def test_empty_prediction_parses(self, tmp_path):
        from tiny_audio_tpu.analysis import parse_results_file
        from tiny_audio_tpu.eval.cli import save_asr_results
        from tiny_audio_tpu.eval.evaluators.base import EvalResult

        out = save_asr_results(
            "m", "d", [EvalResult("some reference", "", 100.0)], {}, str(tmp_path)
        )
        rows = parse_results_file(out / "results.txt")
        assert len(rows) == 1 and rows[0]["prediction"] == ""
        assert rows[0]["wer"] == 100.0

    def test_corpus_wer_reuses_counts(self):
        ev = _EchoEvaluator()
        results, metrics = ev.evaluate(
            [{"audio": {}, "text": "a b"}], verbose=False
        )
        assert "counts" in results[0].extra
        assert metrics["corpus_wer"] == 0.0


class TestReviewRegressions2:
    """Pinned regressions from the round-2 periphery review."""

    def test_gender_substring_not_matched(self):
        from tiny_audio_tpu.eval.evaluators.classification import extract_classes

        # 'male' inside 'female' (and 'he' inside 'the') must not hit
        assert extract_classes("The speaker is female", "gender") == {"female"}
        assert extract_classes("it is a male voice", "gender") == {"male"}

    def test_canonicalize_containment(self):
        from tiny_audio_tpu.eval.evaluators.classification import canonicalize

        assert canonicalize("United States English", "accent") == "american"
        assert canonicalize("male_masculine", "gender") == "male"
        assert canonicalize("England English", "accent") == "british"

    def test_mcq_article_prefix_not_letter_answer(self):
        from tiny_audio_tpu.eval.evaluators.mcq import match_choice

        choices = ["dog barking", "flute music", "rain", "engine"]
        assert match_choice("A flute is playing", choices) == 1
        assert match_choice("A", choices) == 0          # bare letter
        assert match_choice("(B) flute music", choices) == 1
        assert match_choice("B.", choices) == 1

    def test_mcq_gold_resolution(self):
        from tiny_audio_tpu.eval.evaluators.mcq import resolve_gold_index

        choices = ["dog barking", "flute music", "rain", "engine"]
        assert resolve_gold_index("flute music", choices) == 1
        assert resolve_gold_index("Flute Music.", choices) == 1
        assert resolve_gold_index("B", choices) == 1
        assert resolve_gold_index("2", choices) == 2
        assert resolve_gold_index("not a choice", choices) is None

    def test_entity_presence_word_boundary(self):
        from tiny_audio_tpu.analysis import extract_entities

        # bare 'am'/'may' are not entities
        assert extract_entities("i am going and you may go") == []
        assert ("TIME", "8 am") in extract_entities("see you at 8 am")
        assert any(l == "DATE" for l, _ in extract_entities("may 5 deadline"))

    def test_wav2vec2_hf_vocab_remap(self):
        import jax.numpy as jnp
        import numpy as np

        from tiny_audio_tpu.models.wav2vec2 import (
            CTC_LABELS, _HF_960H_VOCAB, _remap_ctc_head,
        )

        # bias whose value IS its HF index -> after remap, position j must
        # hold the HF index of CTC_LABELS[j]
        bias = jnp.arange(len(_HF_960H_VOCAB), dtype=jnp.float32)
        out = np.asarray(_remap_ctc_head(bias, axis=0))
        hf_index = {t: i for i, t in enumerate(_HF_960H_VOCAB)}
        for j, lab in enumerate(CTC_LABELS):
            assert out[j] == hf_index["<pad>" if lab == "-" else lab]
        # 29-wide (torchaudio layout) passes through untouched
        b29 = jnp.arange(len(CTC_LABELS), dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(_remap_ctc_head(b29, 0)),
                                      np.asarray(b29))
