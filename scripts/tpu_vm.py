#!/usr/bin/env python3
"""Remote TPU-VM training orchestration over SSH + tmux.

Re-designed equivalent of ``/root/reference/scripts/deploy/runpod.py``
(963 LoC, Fabric-over-SSH GPU-pod ops) for Google Cloud TPU VMs: deploy the
repo, launch training inside a remote tmux session (survives disconnects),
attach/reattach, pull checkpoints.  Uses plain ``ssh``/``rsync`` subprocesses
— no Fabric dependency — and ``gcloud compute tpus tpu-vm ssh`` when a TPU
name (rather than host) is given.

Commands:
    python scripts/tpu_vm.py deploy  --host <ssh-host|tpu:NAME>
    python scripts/tpu_vm.py train   --host ... [hydra-style overrides...]
    python scripts/tpu_vm.py attach  --host ...
    python scripts/tpu_vm.py eval    --host ... -d <dataset>
    python scripts/tpu_vm.py checkpoint --host ...   # print latest remote ckpt
"""

from __future__ import annotations

import argparse
import shlex
import subprocess
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
REMOTE_DIR = "~/tiny_audio_tpu_repo"
TMUX_SESSION = "ta-train"

ENV_FORWARD = ["HF_TOKEN", "WANDB_API_KEY", "WANDB_RUN_ID", "WANDB_RESUME"]


def _ssh_base(host: str) -> list[str]:
    if host.startswith("tpu:"):
        name = host[len("tpu:"):]
        return [
            "gcloud", "compute", "tpus", "tpu-vm", "ssh", name, "--command",
        ]
    return ["ssh", host]


def run_remote(host: str, command: str, check: bool = True) -> int:
    # _ssh_base already encodes the gcloud/ssh difference (gcloud takes the
    # command via --command, ssh as the trailing argv) — one append works
    # for both
    cmd = _ssh_base(host) + [command]
    print(f"[tpu_vm] $ {command}")
    return subprocess.run(cmd, check=check).returncode


def deploy(host: str) -> None:
    """rsync the repo + build the native library remotely."""
    if host.startswith("tpu:"):
        raise SystemExit("deploy requires a plain ssh host (use gcloud scp for tpu:)")
    subprocess.run(
        [
            "rsync", "-az", "--delete",
            "--exclude", ".git", "--exclude", "outputs",
            "--exclude", "__pycache__", "--exclude", ".jax_cache",
            f"{REPO_ROOT}/", f"{host}:{REMOTE_DIR}/",
        ],
        check=True,
    )
    run_remote(host, f"cd {REMOTE_DIR}/native && make")
    print("[tpu_vm] deployed")


def _env_exports() -> str:
    import os

    exports = []
    for var in ENV_FORWARD:
        value = os.environ.get(var)
        if value:
            exports.append(f"export {var}={shlex.quote(value)}")
    return "; ".join(exports) + ("; " if exports else "")


def train(host: str, overrides: list[str]) -> None:
    """Start (or restart) training in a remote tmux session."""
    args = " ".join(shlex.quote(o) for o in overrides)
    inner = (
        f"{_env_exports()}cd {REMOTE_DIR} && "
        f"python scripts/train.py {args} 2>&1 | tee -a train.log"
    )
    cmd = (
        f"tmux kill-session -t {TMUX_SESSION} 2>/dev/null; "
        f"tmux new-session -d -s {TMUX_SESSION} {shlex.quote(inner)}"
    )
    run_remote(host, cmd)
    print(f"[tpu_vm] training started in tmux session {TMUX_SESSION!r}; "
          f"attach with: python scripts/tpu_vm.py attach --host {host}")


def attach(host: str) -> None:
    base = _ssh_base(host)
    if base[0] == "gcloud":
        raise SystemExit("attach requires a plain ssh host")
    subprocess.run(["ssh", "-t", host, f"tmux attach -t {TMUX_SESSION}"])


def remote_eval(host: str, dataset: str, model: str, n: int) -> None:
    run_remote(
        host,
        f"cd {REMOTE_DIR} && python -m tiny_audio_tpu.cli eval "
        f"-m {shlex.quote(model)} -d {shlex.quote(dataset)} -n {n}",
    )


def latest_checkpoint(host: str) -> None:
    run_remote(
        host,
        f"ls -dt {REMOTE_DIR}/outputs/*/checkpoints/* 2>/dev/null | head -1",
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name in ("deploy", "train", "attach", "eval", "checkpoint"):
        p = sub.add_parser(name)
        p.add_argument("--host", required=True,
                       help="ssh host or tpu:<gcloud-tpu-name>")
        if name == "train":
            p.add_argument("overrides", nargs="*")
        if name == "eval":
            p.add_argument("-d", "--dataset", required=True)
            p.add_argument("-m", "--model", default="outputs/run/model")
            p.add_argument("-n", "--num-samples", type=int, default=100)
    args = ap.parse_args()

    if args.cmd == "deploy":
        deploy(args.host)
    elif args.cmd == "train":
        train(args.host, args.overrides)
    elif args.cmd == "attach":
        attach(args.host)
    elif args.cmd == "eval":
        remote_eval(args.host, args.dataset, args.model, args.num_samples)
    elif args.cmd == "checkpoint":
        latest_checkpoint(args.host)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
