"""Text normalization for WER scoring.

Re-designed equivalent of the reference ``TextNormalizer``
(``/root/reference/scripts/eval/audio.py:59-96``): Whisper's
``EnglishTextNormalizer`` plus project-specific canonicalizations applied to
BOTH hypothesis and reference so the metric stays symmetric.

The reference loads the British->American spelling map from the whisper-tiny
tokenizer's ``english.json`` (a Hub download); offline we run the same
normalizer class with the stem-family map in
:mod:`tiny_audio_tpu.eval.spelling` (~600 pairs), overridable with a real
``english.json`` via ``TA_ENGLISH_JSON`` or the ``spelling_path`` arg.
"""

from __future__ import annotations

import re

# Legacy built-in subset, kept as the last-resort fallback if the spelling
# module is unavailable (the full map lives in eval/spelling.py)
_SPELLING = {
    "accessorise": "accessorize", "analyse": "analyze", "analysed": "analyzed",
    "apologise": "apologize", "behaviour": "behavior", "behaviours": "behaviors",
    "catalogue": "catalog", "centre": "center", "centres": "centers",
    "colour": "color", "coloured": "colored", "colours": "colors",
    "defence": "defense", "dialogue": "dialog", "favour": "favor",
    "favourite": "favorite", "favourites": "favorites", "fibre": "fiber",
    "flavour": "flavor", "flavours": "flavors", "grey": "gray",
    "honour": "honor", "humour": "humor", "labour": "labor",
    "licence": "license", "litre": "liter", "litres": "liters",
    "metre": "meter", "metres": "meters", "neighbour": "neighbor",
    "neighbours": "neighbors", "offence": "offense", "organise": "organize",
    "organised": "organized", "organisation": "organization",
    "organisations": "organizations", "practise": "practice",
    "programme": "program", "programmes": "programs", "realise": "realize",
    "realised": "realized", "recognise": "recognize", "recognised": "recognized",
    "theatre": "theater", "theatres": "theaters", "travelled": "traveled",
    "travelling": "traveling", "tyre": "tire", "tyres": "tires",
}

# Project-specific fixes (reference audio.py:79-90): model emits "okay", many
# references use "ok"; "all right"/"alright" and "kinda"/"kind of" vary by
# corpus convention.
_PROJECT_FIXES = [
    (re.compile(r"\bokay\b"), "ok"),
    (re.compile(r"\ball right\b"), "alright"),
    (re.compile(r"\bkinda\b"), "kind of"),
]


class TextNormalizer:
    """Symmetric WER normalizer: Whisper English normalization + fixes."""

    def __init__(self, spelling_path: str | None = None):
        from transformers.models.whisper.english_normalizer import (
            EnglishTextNormalizer,
        )

        try:
            from tiny_audio_tpu.eval.spelling import load_spelling_map

            spelling = load_spelling_map(spelling_path)
        except ImportError:  # last resort: the built-in ~50-pair subset
            spelling = dict(_SPELLING)
        self._whisper = EnglishTextNormalizer(spelling)

    def normalize(self, text: str) -> str:
        out = self._whisper(text or "")
        for pattern, repl in _PROJECT_FIXES:
            out = pattern.sub(repl, out)
        return re.sub(r"\s+", " ", out).strip()

    __call__ = normalize
