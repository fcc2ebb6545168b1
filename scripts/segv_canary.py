#!/usr/bin/env python
"""Canary for the single-process pytest SIGSEGV (run after any jaxlib bump).

`ta dev test-all` shards the suite into 4 pytest processes because one
process accumulating the full suite's XLA CPU compilations flakily
SIGSEGVs inside jaxlib's ``backend_compile_and_load`` (jax/jaxlib 0.9.0,
observed twice at different tests, same native frame).  The crash does
NOT reproduce with minimal loads — see docs/testing.md for the refuted
hypotheses — so the only faithful canary is the real workload: run the
whole suite in ONE process with faulthandler armed.

Exit 0  -> the jaxlib in this environment survives the full suite
           single-process; `cli.py:_cmd_dev` can drop the sharding.
Exit !0 -> keep sharding (a -11 return code = the segfault is still live).

Run (takes the full-suite ~30 min, CPU-exclusive):
    python scripts/segv_canary.py
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

repo = Path(__file__).resolve().parent.parent


def main() -> int:
    import jax
    import jaxlib

    print(f"jax {jax.__version__} / jaxlib {jaxlib.__version__}", flush=True)
    rc = subprocess.call(
        [sys.executable, "-X", "faulthandler", "-m", "pytest",
         "tests/", "-q", "-p", "no:cacheprovider"],
        cwd=repo,
    )
    if rc == -11 or rc == 139:
        print("CANARY: SIGSEGV still reproduces — keep `dev test-all` "
              "sharded (cli.py:_cmd_dev)", flush=True)
    elif rc == 0:
        print("CANARY: full suite survived one process — the sharding in "
              "cli.py:_cmd_dev can be retired for this jaxlib", flush=True)
    else:
        print(f"CANARY: suite failed with rc={rc} (test failure, not the "
              "segfault) — fix tests first, then re-run", flush=True)
    return rc


if __name__ == "__main__":
    sys.exit(main())
