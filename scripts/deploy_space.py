#!/usr/bin/env python3
"""Deploy the Gradio demo to an HF Space.

Re-designed equivalent of ``/root/reference/scripts/deploy/hf_space.py:19-82``:
create the Space if missing and upload ``demo/`` (+ a requirements file).
Requires network + an HF token.
"""

from __future__ import annotations

import argparse
import sys
import tempfile
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent

REQUIREMENTS = """gradio>=4
jax[cpu]
flax
optax
numpy
transformers
huggingface_hub
"""

# The in-repo loaders read LOCAL paths only; on a Space the model id must be
# snapshot-downloaded first.
APP_BOOTSTRAP = """

def _resolve_model(model_id):
    import os

    if os.path.isdir(model_id):
        return model_id
    from huggingface_hub import snapshot_download

    return snapshot_download(model_id)


demo = create_demo(_resolve_model({model_id!r}))
"""


def deploy(space_id: str, model_id: str, private: bool = False) -> str:
    from huggingface_hub import HfApi

    api = HfApi()
    api.create_repo(
        space_id, repo_type="space", space_sdk="gradio",
        private=private, exist_ok=True,
    )
    with tempfile.TemporaryDirectory() as td:
        stage = Path(td)
        (stage / "app.py").write_text(
            (REPO_ROOT / "demo" / "app.py").read_text()
            + APP_BOOTSTRAP.format(model_id=model_id)
        )
        (stage / "requirements.txt").write_text(REQUIREMENTS)
        pkg = stage / "tiny_audio_tpu"
        from tiny_audio_tpu.hub import artifact_modules

        for rel in artifact_modules():
            src = REPO_ROOT / "tiny_audio_tpu" / rel
            dst = pkg / rel
            dst.parent.mkdir(parents=True, exist_ok=True)
            dst.write_bytes(src.read_bytes())
            for parent in (dst.parent, pkg):
                init = parent / "__init__.py"
                if not init.exists():
                    init.write_text("")
        api.upload_folder(folder_path=td, repo_id=space_id, repo_type="space")
    return f"https://huggingface.co/spaces/{space_id}"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("space_id", help="e.g. username/tiny-audio-tpu-demo")
    ap.add_argument("-m", "--model", required=True, help="HF model id to load")
    ap.add_argument("--private", action="store_true")
    args = ap.parse_args()
    url = deploy(args.space_id, args.model, args.private)
    print(f"deployed: {url}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
