"""Voice-agent demo: local mic -> TinyAudioSTTService -> LLM -> TTS.

Re-designed equivalent of ``/root/reference/demo/agent_demo.py`` (pipecat
voice agent).  Requires pipecat-ai + an OpenAI-compatible endpoint; all
optional in this environment — the module documents the wiring contract.
"""

from __future__ import annotations

import asyncio
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


async def run_agent(model_path: str) -> None:
    from pipecat.audio.vad.silero import SileroVADAnalyzer
    from pipecat.pipeline.pipeline import Pipeline
    from pipecat.pipeline.runner import PipelineRunner
    from pipecat.pipeline.task import PipelineTask
    from pipecat.services.openai.llm import OpenAILLMService
    from pipecat.services.openai.tts import OpenAITTSService
    from pipecat.transports.local.audio import (
        LocalAudioTransport,
        LocalAudioTransportParams,
    )

    from tiny_audio_tpu.integrations.pipecat_stt import TinyAudioSTTService

    transport = LocalAudioTransport(
        LocalAudioTransportParams(
            audio_in_enabled=True,
            audio_out_enabled=True,
            vad_analyzer=SileroVADAnalyzer(),
        )
    )
    stt = TinyAudioSTTService(model_path=model_path, streaming=True)
    api_key = os.environ.get("OPENAI_API_KEY")
    if not api_key:  # friendly setup message, not a raw KeyError traceback
        raise SystemExit("agent demo needs OPENAI_API_KEY set (LLM + TTS)")
    llm = OpenAILLMService(api_key=api_key, model="gpt-4o-mini")
    tts = OpenAITTSService(api_key=api_key, voice="alloy")

    pipeline = Pipeline(
        [transport.input(), stt, llm, tts, transport.output()]
    )
    await PipelineRunner().run(PipelineTask(pipeline))


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    args = ap.parse_args()
    try:
        asyncio.run(run_agent(args.model))
    except ImportError as e:
        print(f"agent demo requires pipecat-ai + openai: {e}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
