"""WER + normalizer contracts."""

import pytest

from tiny_audio_tpu.eval.normalizer import TextNormalizer
from tiny_audio_tpu.eval.wer import align_counts, corpus_wer, wer


class TestWer:
    def test_identical(self):
        assert wer("the cat sat", "the cat sat") == 0.0

    def test_substitution(self):
        assert wer("the cat sat", "the dog sat") == pytest.approx(1 / 3)

    def test_deletion(self):
        assert wer("the cat sat", "the cat") == pytest.approx(1 / 3)

    def test_insertion(self):
        assert wer("the cat", "the big cat") == pytest.approx(1 / 2)

    def test_empty_ref(self):
        assert wer("", "") == 0.0
        assert wer("", "something") == float("inf")

    def test_counts(self):
        c = align_counts("a b c d".split(), "a x c".split())
        assert c.hits == 2
        assert c.substitutions == 1
        assert c.deletions == 1
        assert c.insertions == 0

    def test_corpus_weighting(self):
        # corpus WER is error-weighted, not a mean of per-sample WERs
        refs = ["a b c d e f g h i j", "x"]
        hyps = ["a b c d e f g h i j", "y"]
        assert corpus_wer(refs, hyps) == pytest.approx(1 / 11)

    def test_against_known_alignment(self):
        # classic example: ref 5 words, 1 sub + 1 del + 1 ins = 3/5
        assert wer("this is a test case", "this was a test of case") == pytest.approx(
            2 / 5
        )


class TestNormalizer:
    @pytest.fixture(scope="class")
    def norm(self):
        return TextNormalizer()

    def test_basic(self, norm):
        assert norm("Hello, World!") == "hello world"

    def test_project_fixes(self, norm):
        assert norm("Okay then") == "ok then"
        assert norm("it is all right") == "it is alright"
        assert norm("kinda nice") == "kind of nice"

    def test_spelling(self, norm):
        assert norm("the colour grey") == "the color gray"

    def test_symmetry_property(self, norm):
        # normalizing twice is idempotent
        s = "It's OKAY, the Colour!"
        assert norm(norm(s)) == norm(s)


class TestSpellingMap:
    def test_stem_families_expand(self):
        from tiny_audio_tpu.eval.spelling import load_spelling_map

        m = load_spelling_map()
        assert len(m) > 1000
        assert m["colourful"] == "colorful"
        assert m["organisations"] == "organizations"
        # regression: was a ('glamorous','glamorous') identity typo that the
        # k != v filter silently dropped
        assert m["glamourous"] == "glamorous"
        assert m["kilometres"] == "kilometers"
        assert m["anaesthetic"] == "anesthetic"
        assert m["travelling"] == "traveling"

    def test_us_correct_ise_words_not_mapped(self):
        """-ise words that are correct US spellings must never be rewritten."""
        from tiny_audio_tpu.eval.spelling import load_spelling_map

        m = load_spelling_map()
        for word in ["promise", "wise", "surprise", "exercise", "improvise",
                     "advertise", "advise", "compromise", "franchise"]:
            assert word not in m

    def test_external_json_takes_precedence(self, tmp_path):
        import json

        from tiny_audio_tpu.eval.spelling import load_spelling_map

        f = tmp_path / "english.json"
        f.write_text(json.dumps({"colour": "color"}))
        m = load_spelling_map(str(f))
        assert m == {"colour": "color"}

    def test_normalizer_applies_map(self):
        from tiny_audio_tpu.eval.normalizer import TextNormalizer

        n = TextNormalizer()
        assert n("The colour of the theatre") == "the color of the theater"


def test_corpus_wer_length_mismatch_raises():
    """Regression: zip silently truncated, under-reporting WER when a
    hypothesis went missing."""
    import pytest

    from tiny_audio_tpu.eval.wer import corpus_wer

    with pytest.raises(ValueError, match="2 references vs 1"):
        corpus_wer(["a b", "c d"], ["a b"])
