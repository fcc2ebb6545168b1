"""Subtitle rendering from aligned word timestamps (utils/subtitles.py)."""

from tiny_audio_tpu.utils.subtitles import _cues, to_srt, to_vtt

WORDS = [
    {"word": "HELLO", "start": 0.10, "end": 0.52},
    {"word": "WORLD", "start": 0.60, "end": 1.04},
    # > 1 s gap: new cue
    {"word": "SECOND", "start": 2.50, "end": 3.00},
    {"word": "CUE", "start": 3.05, "end": 3.40},
]


def test_cue_segmentation_on_gap():
    cues = _cues(WORDS)
    assert [c["text"] for c in cues] == ["HELLO WORLD", "SECOND CUE"]
    assert cues[0]["start"] == 0.10 and cues[0]["end"] == 1.04
    assert cues[1]["start"] == 2.50 and cues[1]["end"] == 3.40


def test_cue_segmentation_on_length_and_duration():
    long_words = [
        {"word": "x" * 10, "start": i * 0.4, "end": i * 0.4 + 0.3}
        for i in range(12)
    ]
    for c in _cues(long_words, max_chars=42):
        assert len(c["text"]) <= 42
    # a single word longer than max_chars still yields a (lone) cue
    assert _cues([{"word": "y" * 60, "start": 0, "end": 1}], max_chars=42)
    slow = [
        {"word": "w", "start": float(i), "end": i + 0.9} for i in range(8)
    ]
    for c in _cues(slow, max_duration_s=5.0, max_gap_s=10.0):
        assert c["end"] - c["start"] <= 5.0 + 0.9


def test_srt_format():
    out = to_srt(WORDS)
    blocks = out.strip().split("\n\n")
    assert blocks[0].splitlines() == [
        "1", "00:00:00,100 --> 00:00:01,040", "HELLO WORLD",
    ]
    assert blocks[1].splitlines()[0] == "2"
    assert to_srt([]) == ""


def test_vtt_format():
    out = to_vtt(WORDS)
    lines = out.splitlines()
    assert lines[0] == "WEBVTT"
    assert "00:00:00.100 --> 00:00:01.040" in lines
    assert to_vtt([]).strip() == "WEBVTT"


def test_empty_and_whitespace_words_skipped():
    words = [{"word": "  ", "start": 0, "end": 1},
             {"word": "OK", "start": 1, "end": 2}]
    cues = _cues(words)
    assert len(cues) == 1 and cues[0]["text"] == "OK"


def test_hour_rollover_timestamps():
    words = [{"word": "LATE", "start": 3661.5, "end": 3662.0}]
    assert "01:01:01,500 --> 01:01:02,000" in to_srt(words)
