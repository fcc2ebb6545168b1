"""MCQ (MMAU-style) evaluator: prompt building + robust choice matching.

Re-designed equivalent of ``/root/reference/scripts/eval/evaluators/mcq.py``
(:31-332): the prompt is the question + lettered choices + an instruction to
answer with A/B/C/D; predictions are matched to a choice by exact text,
"(A)"-style letter, bare letter, or substring; accuracy is reported overall
and per category.
"""

from __future__ import annotations

import re
import string
import time
from typing import Iterable, Optional

import numpy as np


def build_mcq_prompt(question: str, choices: list[str]) -> str:
    letters = string.ascii_uppercase
    lines = [question.strip()]
    for letter, choice in zip(letters, choices):
        lines.append(f"({letter}) {choice}")
    lines.append(
        "Listen to the audio and make your choice among "
        + "/".join(letters[: len(choices)])
        + "."
    )
    return "\n".join(lines)


def match_choice(prediction: str, choices: list[str]) -> Optional[int]:
    """Prediction -> choice index (reference mcq.py matching ladder)."""
    pred = (prediction or "").strip()
    if not pred:
        return None
    pred_l = pred.lower()
    letters = string.ascii_uppercase[: len(choices)]

    # 1. exact choice text
    for i, c in enumerate(choices):
        if pred_l == c.strip().lower():
            return i
    # 2. "(A)" / "A)" / "A." / bare letter prefix
    m = re.match(r"^\(?([A-Za-z])[\).:\s]", pred + " ")
    if m and m.group(1).upper() in letters:
        return letters.index(m.group(1).upper())
    # 3. choice text as substring (longest first to avoid nesting) — BEFORE
    # the bare-letter rung, which would otherwise misread the English
    # articles "a"/"I" inside a free-text answer as choice A/I
    order = sorted(range(len(choices)), key=lambda i: -len(choices[i]))
    for i in order:
        if choices[i].strip().lower() in pred_l:
            return i
    # 4. UPPERCASE letter mentioned as a standalone token ("the answer is B")
    for t in re.findall(r"\b([A-Z])\b", pred):
        if t in letters:
            return letters.index(t)
    return None


class MCQEvaluator:
    def __init__(self, transcribe_fn, model_name: str = "local"):
        """``transcribe_fn(audio_dict, prompt) -> str``."""
        self.transcribe_fn = transcribe_fn
        self.model_name = model_name

    def evaluate(
        self, dataset: Iterable[dict], num_samples: Optional[int] = None,
        question_column: str = "question", choices_column: str = "choices",
        answer_column: str = "answer", category_column: str = "task",
        verbose: bool = True,
    ) -> tuple[list[dict], dict]:
        results = []
        for i, sample in enumerate(dataset):
            if num_samples and i >= num_samples:
                break
            choices = list(sample[choices_column])
            prompt = build_mcq_prompt(sample[question_column], choices)
            t0 = time.time()
            try:
                prediction = self.transcribe_fn(sample["audio"], prompt)
                error = None
            except Exception as e:
                prediction, error = "", str(e)
            pred_idx = match_choice(prediction, choices)
            answer = sample[answer_column]
            gold_idx = (
                choices.index(answer) if answer in choices
                else int(answer) if str(answer).isdigit() else None
            )
            row = {
                "prediction": prediction,
                "pred_idx": pred_idx,
                "gold_idx": gold_idx,
                "correct": pred_idx is not None and pred_idx == gold_idx,
                "category": sample.get(category_column, "all"),
                "time_s": time.time() - t0,
            }
            if error:
                row["error"] = error
            results.append(row)
            if verbose and (i + 1) % 50 == 0:
                print(f"[eval] {i + 1} samples", flush=True)
        return results, self.compute_metrics(results)

    @staticmethod
    def compute_metrics(results: list[dict]) -> dict:
        if not results:
            return {"accuracy": 0.0, "num_samples": 0}
        by_cat: dict[str, list[bool]] = {}
        for r in results:
            by_cat.setdefault(r["category"], []).append(r["correct"])
        metrics = {
            "accuracy": 100.0 * float(np.mean([r["correct"] for r in results])),
            "num_samples": len(results),
            "unmatched": sum(1 for r in results if r["pred_idx"] is None),
        }
        for cat, vals in sorted(by_cat.items()):
            metrics[f"accuracy_{cat}"] = 100.0 * float(np.mean(vals))
        return metrics
