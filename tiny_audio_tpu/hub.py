"""Hub artifact: code-carrying checkpoint staging + optional HF upload.

Re-designed equivalent of ``/root/reference/scripts/hub/push.py:18-110`` and
the reference's self-contained-artifact contract (SURVEY.md §1: checkpoints
carry the source files needed to run them).  :func:`stage_artifact` copies
the runtime source modules + model card + tokenizer files into the
checkpoint dir; :func:`push_to_hub` uploads it (gated on huggingface_hub +
credentials — this build environment has zero egress).
"""

from __future__ import annotations

import re
import shutil
from pathlib import Path
from typing import Optional

# Serving-surface entry points a consumer calls directly; every module they
# (transitively) import ships too — a hand-maintained list silently broke
# the artifact whenever a staged file grew an import (encoder_attention,
# wav2vec2/ctc, ecapa/native were all missing at one point, so transcription
# crashed on TPU and timestamps/speakers failed at import).
ARTIFACT_ENTRYPOINTS = [
    "config.py",
    "generation.py",
    "pipeline.py",
    "processing.py",
    "tokenization.py",
    "alignment.py",
    "diarization.py",
    "handler.py",
    "serving.py",
    "batching.py",
    "models/asr.py",
]

_IMPORT_DOTTED = re.compile(
    r"^\s*(?:from|import)\s+tiny_audio_tpu\.([A-Za-z0-9_.]+)", re.M
)
# `from tiny_audio_tpu[.sub] import a, b` — each name may itself be a
# submodule (e.g. `from tiny_audio_tpu.ops import mel`).  Single-line and
# parenthesized multi-line forms matched separately (a greedy \s-class
# here once swallowed following lines and silently dropped `native`).
# `as` aliases and trailing comments are stripped in the consumer —
# `import mel as _mel  # note` must still stage ops/mel.py.
_IMPORT_FROM = re.compile(
    r"^\s*from\s+tiny_audio_tpu((?:\.[A-Za-z0-9_.]+)?)\s+import\s+"
    r"([A-Za-z0-9_, \t]+(?:\s+as\s+[A-Za-z0-9_]+)?"
    r"(?:\s*,\s*[A-Za-z0-9_]+(?:\s+as\s+[A-Za-z0-9_]+)?)*)",
    re.M,
)
_IMPORT_FROM_PAREN = re.compile(
    r"^\s*from\s+tiny_audio_tpu((?:\.[A-Za-z0-9_.]+)?)\s+import\s+"
    r"\(([^)]*)\)",
    re.M | re.S,
)


def _files_for_module(pkg_root: Path, mod: str) -> list[str]:
    rel = mod.replace(".", "/")
    if (pkg_root / (rel + ".py")).is_file():
        return [rel + ".py"]
    if (pkg_root / rel).is_dir():
        return [rel + "/__init__.py"]
    return []


def artifact_modules() -> list[str]:
    """Transitive closure of in-package imports from the entry points."""
    pkg_root = Path(__file__).resolve().parent
    seen: set[str] = set()
    queue = list(ARTIFACT_ENTRYPOINTS)
    while queue:
        rel = queue.pop()
        if rel in seen or not (pkg_root / rel).is_file():
            continue
        seen.add(rel)
        src = (pkg_root / rel).read_text()
        mods: list[str] = []
        for m in _IMPORT_DOTTED.finditer(src):
            parts = m.group(1).split(".")
            for depth in range(1, len(parts) + 1):
                mods.append(".".join(parts[:depth]))
        for pat in (_IMPORT_FROM, _IMPORT_FROM_PAREN):
            for m in pat.finditer(src):
                base = m.group(1).lstrip(".")
                for name in m.group(2).split(","):
                    # strip comments and `as` aliases: the bare name is
                    # what maps to a module file
                    name = name.split("#")[0].split(" as ")[0].strip()
                    if name:
                        # the imported name may be a symbol OR a submodule
                        # — queue both interpretations; non-files drop out
                        mods.append(f"{base}.{name}" if base else name)
        for mod in mods:
            for f in _files_for_module(pkg_root, mod):
                if f not in seen:
                    queue.append(f)
    return sorted(seen)

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
    for rel in artifact_modules():
        src = pkg_root / rel
        dst = code_dir / rel
        dst.parent.mkdir(parents=True, exist_ok=True)
        shutil.copy2(src, dst)
        # package markers (only where the real package has a bare one;
        # real __init__.py files are staged via the closure itself)
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
