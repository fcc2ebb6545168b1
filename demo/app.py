"""Gradio demo: mic/file transcription with timestamps, diarization, prompts.

Re-designed equivalent of ``/root/reference/demo/app.py:103-209``.  gradio is
an optional dependency (not in the TPU build image); ``create_demo`` imports
it lazily so the repo imports cleanly without it.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def create_demo(model_path: str):
    import gradio as gr

    from tiny_audio_tpu.models.asr import ASRModel
    from tiny_audio_tpu.pipeline import ASRPipeline

    pipe = ASRPipeline(ASRModel.from_pretrained(model_path))

    def transcribe(audio_path, timestamps, speakers, prompt):
        if not audio_path:
            return "(no audio)", ""
        kwargs = {}
        if timestamps:
            kwargs["return_timestamps"] = True
        if speakers:
            kwargs["return_speakers"] = True
        if prompt:
            kwargs["user_prompt"] = prompt
        try:
            result = pipe(audio_path, **kwargs)
        except Exception as e:  # e.g. non-WAV upload: wave.Error
            return "", (f"error: {type(e).__name__}: {e}\n"
                        "(uploads must be PCM WAV, 16 kHz preferred)")
        detail_lines = []
        for w in result.get("words", []):
            spk = f" [{w['speaker']}]" if w.get("speaker") else ""
            detail_lines.append(
                f"{w['start']:6.2f}-{w['end']:6.2f}  {w['word']}{spk}"
            )
        for s in result.get("speaker_segments", []):
            detail_lines.append(
                f"{s['speaker']}: {s['start']:.2f}-{s['end']:.2f}"
            )
        for err_key in ("timestamp_error", "diarization_error"):
            if result.get(err_key):  # surface feature failures, not a blank pane
                detail_lines.append(f"{err_key}: {result[err_key]}")
        return result["text"], "\n".join(detail_lines)

    with gr.Blocks(title="tiny-audio-tpu") as demo:
        gr.Markdown("# tiny-audio-tpu — TPU-native speech-LLM ASR")
        audio = gr.Audio(sources=["microphone", "upload"], type="filepath")
        with gr.Row():
            timestamps = gr.Checkbox(label="Word timestamps")
            speakers = gr.Checkbox(label="Speaker diarization")
        prompt = gr.Textbox(label="Custom prompt (optional)")
        btn = gr.Button("Transcribe")
        text = gr.Textbox(label="Transcript")
        detail = gr.Textbox(label="Details", lines=8)
        btn.click(transcribe, [audio, timestamps, speakers, prompt], [text, detail])
    return demo


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("--share", action="store_true")
    args = ap.parse_args()
    create_demo(args.model).launch(share=args.share)
