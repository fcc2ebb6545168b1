#!/usr/bin/env python3
"""Augmentation-corpus downloaders: OpenSLR-28 RIRs, MUSAN, FSD50K.

Re-designed equivalent of the reference's ``ta dev download-rirs /
download-musan / download-fsd50k`` (``/root/reference/scripts/dev.py:230-430``):
fetch + extract with resume support.  Requires network (the build
environment has zero egress — run this on the training host), after which
point the training config's ``rir_dir``/``noise_dir``/``transient_dir``
fields can point at the extracted directories.
"""

from __future__ import annotations

import argparse
import sys
import tarfile
import urllib.request
import zipfile
from pathlib import Path

CORPORA = {
    "rirs": {
        "url": "https://www.openslr.org/resources/28/rirs_noises.zip",
        "archive": "rirs_noises.zip",
        "note": "OpenSLR-28 recorded room impulse responses (~1 GB)",
    },
    "musan": {
        "url": "https://www.openslr.org/resources/17/musan.tar.gz",
        "archive": "musan.tar.gz",
        "note": "MUSAN music/speech/noise corpus (~11 GB)",
    },
    "fsd50k": {
        # Zenodo ships dev_audio as a SPLIT zip: .z01-.z05 + the final .zip
        # (downloading only the .zip part fails zipfile extraction with
        # BadZipFile).  All parts are fetched and merged with `zip -FF`.
        "url": "https://zenodo.org/record/4060432/files/FSD50K.dev_audio.zip",
        "parts": [
            f"https://zenodo.org/record/4060432/files/FSD50K.dev_audio.z0{i}"
            for i in range(1, 6)
        ],
        "archive": "FSD50K.dev_audio.zip",
        "note": "FSD50K short sound events (~24 GB, 6-part split zip)",
    },
}


def download(url: str, dest: Path) -> None:
    """Resume-capable download."""
    dest.parent.mkdir(parents=True, exist_ok=True)
    existing = dest.stat().st_size if dest.exists() else 0
    req = urllib.request.Request(url)
    if existing:
        req.add_header("Range", f"bytes={existing}-")
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            mode = "ab" if existing and resp.status == 206 else "wb"
            with dest.open(mode) as f:
                while True:
                    chunk = resp.read(1 << 20)
                    if not chunk:
                        break
                    f.write(chunk)
                    done = f.tell()
                    print(f"\r{dest.name}: {done / 1e9:.2f} GB", end="",
                          file=sys.stderr)
    except urllib.error.HTTPError as e:
        if e.code == 416:  # already complete
            return
        raise
    print(file=sys.stderr)


def merge_split_zip(final_part: Path) -> Path:
    """Reassemble a multi-part zip (x.z01.. + x.zip) into one archive via
    ``zip -FF`` (the standard split-zip repair/merge)."""
    import shutil
    import subprocess

    if shutil.which("zip") is None:
        raise RuntimeError(
            f"{final_part.name} is a split zip; install `zip` (for -FF "
            "merge) or reassemble manually"
        )
    merged = final_part.with_suffix(".merged.zip")
    subprocess.run(
        ["zip", "-FF", str(final_part), "--out", str(merged)],
        check=True, input=b"y\n",
    )
    return merged


def extract(archive: Path, out_dir: Path, split: bool = False) -> None:
    out_dir.mkdir(parents=True, exist_ok=True)
    if archive.suffix == ".zip":
        if split:
            archive = merge_split_zip(archive)
        with zipfile.ZipFile(archive) as z:
            z.extractall(out_dir)
    else:
        with tarfile.open(archive) as t:
            # filter='data' blocks ../ path traversal from a tampered
            # mirror (and is the 3.14 default)
            t.extractall(out_dir, filter="data")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("corpus", choices=sorted(CORPORA))
    ap.add_argument("--dir", default="corpora")
    ap.add_argument("--no-extract", action="store_true")
    args = ap.parse_args()

    spec = CORPORA[args.corpus]
    base = Path(args.dir)
    archive = base / spec["archive"]
    print(f"[download] {spec['note']}")
    for part_url in spec.get("parts", []):  # split-zip parts first
        download(part_url, base / part_url.rsplit("/", 1)[-1])
    download(spec["url"], archive)
    if not args.no_extract:
        extract(archive, base / args.corpus, split=bool(spec.get("parts")))
        print(f"[download] extracted to {base / args.corpus}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
