"""Terminal streaming demo: transcribe a wav file token-by-token.

Re-designed equivalent of ``/root/reference/demo/streaming_demo.py`` (which
streams from a local microphone through pipecat); in a headless TPU
environment the demo streams a wav file and prints fragments with TTFB.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("wav", help="path to a 16 kHz wav file")
    args = ap.parse_args()

    from tiny_audio_tpu.models.asr import ASRModel
    from tiny_audio_tpu.pipeline import ASRPipeline

    pipe = ASRPipeline(ASRModel.from_pretrained(args.model))
    audio = ASRPipeline.extract_audio(args.wav)
    arr = audio["array"]
    limit = int(ASRPipeline.MAX_CHUNK_SECONDS * audio["sampling_rate"])
    if len(arr) > limit:
        # streaming bypasses the pipeline's long-form chunking; past the
        # encoder window it would crash, so stream the first window only
        print(f"[streaming demo: clip > {ASRPipeline.MAX_CHUNK_SECONDS:.0f}s,"
              " streaming the first window]", file=sys.stderr)
        arr = arr[:limit]
    feats = pipe.processor.extract_features(arr)

    t0 = time.time()
    first = None
    for fragment in pipe.model.generate_streaming(
        feats["input_features"], feats["audio_attention_mask"]
    ):
        if first is None:
            first = time.time() - t0
        print(fragment, end="", flush=True)
    print()
    ttfb = f"{first:.3f}s" if first is not None else "n/a (no output)"
    print(f"[TTFB {ttfb}, total {time.time() - t0:.3f}s]", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
