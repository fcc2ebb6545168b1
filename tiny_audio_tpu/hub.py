"""Hub artifact: code-carrying checkpoint staging + optional HF upload.

Re-designed equivalent of ``/root/reference/scripts/hub/push.py:18-110`` and
the reference's self-contained-artifact contract (SURVEY.md §1: checkpoints
carry the source files needed to run them).  :func:`stage_artifact` copies
the runtime source modules + model card + tokenizer files into the
checkpoint dir; :func:`push_to_hub` uploads it (gated on huggingface_hub +
credentials — this build environment has zero egress).
"""

from __future__ import annotations

import shutil
from pathlib import Path
from typing import Optional

# Source modules a consumer needs to run the checkpoint standalone
# (the reference copies asr_*.py/projectors/alignment/diarization,
# asr_modeling.py:843-852)
ARTIFACT_MODULES = [
    "config.py",
    "generation.py",
    "pipeline.py",
    "processing.py",
    "tokenization.py",
    "alignment.py",
    "diarization.py",
    "models/asr.py",
    "models/decoder.py",
    "models/encoder.py",
    "models/layers.py",
    "models/projectors.py",
    "ops/attention.py",
    "ops/mel.py",
    "utils/audio_io.py",
]

GITATTRIBUTES = """*.msgpack filter=lfs diff=lfs merge=lfs -text
*.safetensors filter=lfs diff=lfs merge=lfs -text
*.bin filter=lfs diff=lfs merge=lfs -text
"""


def stage_artifact(
    checkpoint_dir: str | Path,
    model_card: Optional[str | Path] = None,
) -> Path:
    """Copy runtime sources + metadata into a checkpoint dir so the artifact
    is self-contained."""
    ckpt = Path(checkpoint_dir)
    if not (ckpt / "config.json").exists():
        raise FileNotFoundError(f"{ckpt} is not a checkpoint (no config.json)")
    pkg_root = Path(__file__).resolve().parent
    code_dir = ckpt / "tiny_audio_tpu"
    for rel in ARTIFACT_MODULES:
        src = pkg_root / rel
        dst = code_dir / rel
        dst.parent.mkdir(parents=True, exist_ok=True)
        shutil.copy2(src, dst)
        # package markers
        for parent in [dst.parent, code_dir]:
            init = parent / "__init__.py"
            if not init.exists():
                init.write_text("")
    (ckpt / ".gitattributes").write_text(GITATTRIBUTES)

    card_dst = ckpt / "README.md"
    if model_card and Path(model_card).exists():
        shutil.copy2(model_card, card_dst)
    elif not card_dst.exists():
        repo_card = pkg_root.parent / "MODEL_CARD.md"
        if repo_card.exists():
            shutil.copy2(repo_card, card_dst)
        else:
            card_dst.write_text(
                "# tiny-audio-tpu checkpoint\n\n"
                "Self-contained TPU-native ASR checkpoint "
                "(tiny_audio_tpu framework).\n"
            )
    return ckpt


def push_to_hub(
    checkpoint_dir: str | Path,
    repo_id: str,
    private: bool = False,
    token: Optional[str] = None,
) -> str:
    """Stage + upload a checkpoint to the HF Hub."""
    stage_artifact(checkpoint_dir)
    try:
        from huggingface_hub import HfApi
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("huggingface_hub is required for push") from e
    api = HfApi(token=token)
    api.create_repo(repo_id, private=private, exist_ok=True)
    api.upload_folder(folder_path=str(checkpoint_dir), repo_id=repo_id)
    return f"https://huggingface.co/{repo_id}"


class PushToHubCallback:
    """Trainer callback: push the model artifact to the Hub on every save
    (reference train.py:440-458; failures are swallowed so flaky networking
    never kills a run — same ``contextlib.suppress`` contract)."""

    def __init__(self, repo_id: str, private: bool = False):
        self.repo_id = repo_id
        self.private = private

    def on_save(self, trainer, step: int) -> None:
        import contextlib

        with contextlib.suppress(Exception):
            push_to_hub(
                trainer.out_dir / "model", self.repo_id, private=self.private
            )


def add_push_parser(subparsers) -> None:
    p = subparsers.add_parser("push", help="Stage/push a checkpoint artifact")
    p.add_argument("-m", "--model", required=True, help="checkpoint dir")
    p.add_argument("-r", "--repo-id", default=None,
                   help="HF repo id; omit to only stage locally")
    p.add_argument("--private", action="store_true")
    p.set_defaults(func=_cmd_push)


def _cmd_push(args) -> int:
    if args.repo_id:
        url = push_to_hub(args.model, args.repo_id, private=args.private)
        print(f"pushed: {url}")
    else:
        out = stage_artifact(args.model)
        print(f"staged self-contained artifact at: {out}")
    return 0
