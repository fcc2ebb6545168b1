#!/usr/bin/env python3
"""SIFT paralinguistic-caption dataset generator.

Re-designed equivalent of ``/root/reference/scripts/generate_sift_dataset.py``
(582 LoC): pull emotion/speech corpora, normalize their metadata (age ->
group, dB -> volume label, speaking rate -> pace), prompt an LLM to produce
"Sounds like ..." one-line captions, and emit a SIFT training dataset
(task="sift" rows consumed by configs/data/multitask.yaml).

The reference drives 12+ corpora (CREMA-D, RAVDESS, MELD, ESD, TESS, SAVEE,
CommonVoice, podcasts) through a Qwen LLM; corpus ids and the caption
contract are kept.  The LLM step accepts any callable — by default a
template-based captioner so the pipeline runs hermetically; pass an actual
LLM callable for production quality.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path
from typing import Callable, Iterable, Optional

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Corpora the reference mixes (scripts/generate_sift_dataset.py)
# label_column = the corpus's actual column; label_kind = the attribute it
# carries (CREMA-D keeps emotion under 'label' — see eval/datasets.py)
SIFT_CORPORA = [
    {"path": "confit/cremad", "label_column": "label", "label_kind": "emotion"},
    {"path": "narad/ravdess", "label_column": "emotion", "label_kind": "emotion"},
    {"path": "declare-lab/MELD", "label_column": "emotion", "label_kind": "emotion"},
    {"path": "hltcoe/ESD", "label_column": "emotion", "label_kind": "emotion"},
    {"path": "tess", "label_column": "emotion", "label_kind": "emotion"},
    {"path": "savee", "label_column": "emotion", "label_kind": "emotion"},
    {"path": "mozilla-foundation/common_voice_17_0", "label_column": "age",
     "label_kind": "age"},
    {"path": "ylacombe/expresso", "label_column": "style", "label_kind": "style"},
]


# ------------------------------------------------------- metadata normalizers


def age_to_group(age) -> Optional[str]:
    """Numeric age or CV age-string -> coarse group (reference normalizer)."""
    if age is None:
        return None
    if isinstance(age, str):
        return age.strip().lower() or None
    age = float(age)
    if age < 20:
        return "teens"
    for lo, name in ((20, "twenties"), (30, "thirties"), (40, "forties"),
                     (50, "fifties"), (60, "sixties"), (70, "seventies")):
        if lo <= age < lo + 10:
            return name
    return "eighties"


def db_to_volume(db: Optional[float]) -> Optional[str]:
    if db is None:
        return None
    if db < -30:
        return "quiet"
    if db < -15:
        return "moderate"
    return "loud"


def rate_to_pace(words_per_second: Optional[float]) -> Optional[str]:
    if words_per_second is None:
        return None
    if words_per_second < 2.0:
        return "slow"
    if words_per_second < 3.5:
        return "measured"
    return "brisk"


def normalize_metadata(sample: dict, label_column: Optional[str] = None,
                       label_kind: Optional[str] = None) -> dict:
    """Raw corpus row -> canonical attribute dict.

    ``label_column``/``label_kind``: where the corpus stores its primary
    label and what attribute it is (e.g. CREMA-D keeps emotion under
    'label' — without this mapping such corpora silently contributed zero
    rows because none of the hardcoded keys matched)."""
    import numpy as np

    attrs: dict = {}
    if label_column and label_kind:
        v = sample.get(label_column)
        if v:
            attrs[label_kind] = str(v).strip().lower()
    for key in ("emotion", "style", "gender", "accent"):
        v = sample.get(key)
        if v:
            attrs[key] = str(v).strip().lower()
    attrs["age_group"] = age_to_group(sample.get("age"))

    audio = sample.get("audio")
    if isinstance(audio, dict) and audio.get("array") is not None:
        arr = np.asarray(audio["array"], np.float32)
        if arr.size:
            rms = float(np.sqrt(np.mean(arr**2)) + 1e-12)
            attrs["volume"] = db_to_volume(20 * np.log10(rms))
            text = sample.get("text") or ""
            dur = arr.size / float(audio.get("sampling_rate", 16000))
            if text and dur > 0:
                attrs["pace"] = rate_to_pace(len(text.split()) / dur)
    return {k: v for k, v in attrs.items() if v}


# ------------------------------------------------------------------ captions


def template_caption(attrs: dict) -> str:
    """Deterministic fallback captioner: 'Sounds like ...' one-liner."""
    bits = []
    if attrs.get("gender"):
        bits.append(f"a {attrs['gender']} speaker")
    else:
        bits.append("a speaker")
    if attrs.get("age_group"):
        bits.append(f"in their {attrs['age_group']}")
    if attrs.get("emotion"):
        bits.append(f"sounding {attrs['emotion']}")
    if attrs.get("style") and attrs.get("style") != attrs.get("emotion"):
        bits.append(f"with a {attrs['style']} delivery")
    if attrs.get("pace"):
        bits.append(f"speaking at a {attrs['pace']} pace")
    if attrs.get("volume"):
        bits.append(f"at a {attrs['volume']} volume")
    return "Sounds like " + " ".join(bits) + "."


def llm_caption_prompt(attrs: dict) -> str:
    """The captioning prompt contract for an LLM captioner."""
    return (
        "Write exactly one natural sentence starting with 'Sounds like' "
        "describing a speaker with these attributes: "
        + json.dumps(attrs)
        + ". Mention only the given attributes."
    )


def generate_sift_rows(
    samples: Iterable[dict],
    captioner: Optional[Callable[[dict], str]] = None,
    max_rows: Optional[int] = None,
) -> list[dict]:
    captioner = captioner or template_caption
    rows = []
    for sample in samples:
        attrs = normalize_metadata(
            sample, sample.get("_label_column"), sample.get("_label_kind")
        )
        if not attrs:
            continue
        audio = sample.get("audio")
        row = {
            "audio": audio,
            "text": sample.get("text", ""),
            "sift_response": captioner(attrs),
            "attributes": attrs,
            "task": "sift",
            # provenance so jsonl rows (audio stripped) can be joined back
            # to their waveform at training time
            "source": sample.get("_source"),
            "row_idx": sample.get("_row_idx"),
        }
        if isinstance(audio, dict) and audio.get("path"):
            row["audio_path"] = audio["path"]
        rows.append(row)
        if max_rows and len(rows) >= max_rows:
            break
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--output", default="outputs/sift_dataset")
    ap.add_argument("--max-rows", type=int, default=1000)
    ap.add_argument("--synthetic", action="store_true",
                    help="generate from synthetic audio (hermetic smoke)")
    args = ap.parse_args()

    if args.synthetic:
        from tiny_audio_tpu.train.data import synthetic_dataset

        import numpy as np

        rng = np.random.default_rng(0)
        samples = synthetic_dataset(args.max_rows, seed=0)
        emotions = ["happy", "sad", "angry", "neutral"]
        for s in samples:
            s["emotion"] = str(rng.choice(emotions))
            s["age"] = int(rng.integers(18, 80))
    else:
        import datasets as hfd

        samples = []
        quota = max(1, args.max_rows // len(SIFT_CORPORA))  # floor-0 guard
        for corpus in SIFT_CORPORA:
            try:
                ds = hfd.load_dataset(corpus["path"], split="train", streaming=True)
                for i, row in enumerate(ds):
                    if i >= quota:
                        break
                    samples.append(dict(
                        row, _source=corpus["path"], _row_idx=i,
                        _label_column=corpus["label_column"],
                        _label_kind=corpus["label_kind"],
                    ))
            except Exception as e:
                print(f"[sift] skipping {corpus['path']}: {e}", file=sys.stderr)

    rows = generate_sift_rows(samples, max_rows=args.max_rows)
    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)
    with (out / "sift.jsonl").open("w") as f:
        for r in rows:
            meta = {k: v for k, v in r.items() if k != "audio"}
            f.write(json.dumps(meta) + "\n")
    print(f"[sift] wrote {len(rows)} rows to {out / 'sift.jsonl'}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
