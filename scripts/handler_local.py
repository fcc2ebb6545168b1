#!/usr/bin/env python3
"""Local smoke-runner for the serving handler.

Re-designed equivalent of ``/root/reference/scripts/deploy/handler_local.py``
(201 LoC): find a checkpoint (latest under outputs/ if not given) and a test
wav (synthesized if not given), run one request through
:class:`EndpointHandler`, print the response.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def find_latest_checkpoint(outputs: Path = Path("outputs")) -> Path:
    candidates = sorted(
        (p for p in outputs.glob("*/model") if (p / "config.json").exists()),
        key=lambda p: p.stat().st_mtime,
    )
    if not candidates:
        raise SystemExit("no checkpoints under outputs/ (pass --model)")
    return candidates[-1]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", default=None)
    ap.add_argument("--wav", default=None)
    ap.add_argument("--timestamps", action="store_true")
    ap.add_argument("--speakers", action="store_true")
    args = ap.parse_args()

    model_path = Path(args.model) if args.model else find_latest_checkpoint()
    print(f"[handler_local] checkpoint: {model_path}")

    if args.wav:
        inputs = Path(args.wav).read_bytes()
    else:
        t = np.arange(16000 * 2) / 16000
        inputs = (0.2 * np.sin(2 * np.pi * 180 * t)).astype(np.float32)
        print("[handler_local] no wav given; using a synthesized 2 s tone")

    from tiny_audio_tpu.handler import EndpointHandler

    handler = EndpointHandler(str(model_path))
    params = {}
    if args.timestamps:
        params["return_timestamps"] = True
    if args.speakers:
        params["return_speakers"] = True
    result = handler({"inputs": inputs, "parameters": params})
    for key, value in result.items():
        print(f"{key}: {value}")
    return 0 if "error" not in result else 1


if __name__ == "__main__":
    raise SystemExit(main())
