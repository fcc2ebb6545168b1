"""Environment diagnostics: ``ta doctor``.

A deployment sanity check with no reference counterpart — born from this
project's own ops pain: a dead remote-TPU tunnel hangs the FIRST backend
touch indefinitely with no error, which looks exactly like a slow compile.
The backend probe therefore runs in a subprocess under a timeout (the same
pattern as ``bench.py``), so a wedged accelerator becomes a diagnosis
instead of a hung process.

Checks: library versions, accelerator backend (platform/device count/a
timed matmul), persistent compile cache (dir, entries, writability), and
the native C++ audio runtime.  Exit code 0 = healthy, 1 = degraded (CPU
fallback or no cache), 2 = accelerator unreachable.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from typing import Optional

#: subprocess snippet: initialize the backend, time one matmul, report JSON.
_PROBE = r"""
import json, os, time
import jax, jax.numpy as jnp
plat = os.environ.get("TA_DOCTOR_PLATFORM")
if plat:
    jax.config.update("jax_platforms", plat)
devs = jax.devices()
x = jnp.ones((1024, 1024), jnp.bfloat16)
(x @ x).block_until_ready()  # compile
t0 = time.time()
for _ in range(8):
    y = x @ x
y.block_until_ready()
print(json.dumps({
    "platform": devs[0].platform,
    "device_count": len(devs),
    "device_kind": getattr(devs[0], "device_kind", "?"),
    "matmul_ms": round((time.time() - t0) / 8 * 1000, 3),
}))
"""


def _probe_backend(timeout_s: float) -> dict:
    try:
        out = subprocess.run(
            [sys.executable, "-c", _PROBE], capture_output=True,
            timeout=timeout_s, text=True,
        )
    except subprocess.TimeoutExpired:
        return {"ok": False, "error": (
            "backend init exceeded the probe timeout "
            f"({timeout_s:.0f}s) — remote-TPU tunnel down or wedged"
        )}
    if out.returncode != 0:
        return {"ok": False,
                "error": (out.stderr or "probe failed").strip()[-400:]}
    try:
        return {"ok": True, **json.loads(out.stdout.strip().splitlines()[-1])}
    except (ValueError, IndexError):
        return {"ok": False, "error": "probe printed no JSON"}


def _check_versions() -> dict:
    import flax
    import jax
    import jaxlib
    import numpy

    vers = {
        "python": sys.version.split()[0],
        "jax": jax.__version__,
        "jaxlib": jaxlib.__version__,
        "flax": flax.__version__,
        "numpy": numpy.__version__,
    }
    try:
        import optax

        vers["optax"] = optax.__version__
    except Exception:
        pass
    return vers


def _check_cache() -> dict:
    from tiny_audio_tpu.utils.compile_cache import default_cache_dir

    d = default_cache_dir()
    if d is None:
        return {"dir": None, "enabled": False}
    info: dict = {"dir": d, "enabled": True}
    try:
        entries = os.listdir(d) if os.path.isdir(d) else []
        info["entries"] = len(entries)
        probe = os.path.join(d, ".doctor_write_probe")
        os.makedirs(d, exist_ok=True)
        with open(probe, "w") as f:
            f.write("ok")
        os.remove(probe)
        info["writable"] = True
    except OSError as e:
        info["writable"] = False
        info["error"] = str(e)
    return info


def _check_native() -> dict:
    try:
        from tiny_audio_tpu import native

        return {"available": native.available()}
    except Exception as e:  # pragma: no cover - defensive
        return {"available": False, "error": str(e)}


def run_doctor(probe_timeout_s: Optional[float] = None) -> dict:
    """Run all checks; returns the structured report (also used by tests)."""
    timeout = probe_timeout_s if probe_timeout_s is not None else float(
        os.environ.get("TA_DOCTOR_PROBE_S", "300")
    )
    report = {
        "versions": _check_versions(),
        "backend": _probe_backend(timeout),
        "compile_cache": _check_cache(),
        "native_audio": _check_native(),
    }
    be = report["backend"]
    if not be.get("ok"):
        report["status"] = "unreachable"
    elif be.get("platform") == "cpu":
        report["status"] = "degraded"  # no accelerator
    else:
        report["status"] = "healthy"
    return report


def main(probe_timeout_s: Optional[float] = None, as_json: bool = False) -> int:
    report = run_doctor(probe_timeout_s)
    if as_json:
        print(json.dumps(report))
    else:
        v = report["versions"]
        print("versions : " + ", ".join(f"{k} {x}" for k, x in v.items()))
        be = report["backend"]
        if be.get("ok"):
            print(f"backend  : {be['platform']} x{be['device_count']} "
                  f"({be['device_kind']}), matmul {be['matmul_ms']} ms")
        else:
            print(f"backend  : UNREACHABLE — {be.get('error')}")
        c = report["compile_cache"]
        if c.get("enabled"):
            w = "writable" if c.get("writable") else f"NOT WRITABLE ({c.get('error')})"
            print(f"cache    : {c['dir']} ({c.get('entries', '?')} entries, {w})")
        else:
            print("cache    : disabled")
        n = report["native_audio"]
        print("native   : " + ("C++ audio runtime loaded" if n.get("available")
                               else "numpy fallbacks (build with `ta dev build-native`)"))
        print(f"status   : {report['status']}")
    return {"healthy": 0, "degraded": 1, "unreachable": 2}[report["status"]]
