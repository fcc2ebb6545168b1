"""Diagnose persistent-compile-cache key stability across processes.

The driver's bench paid a cold compile in rounds 2 and 4 despite a warmed
repo-local ``.jax_cache`` (VERDICT r4 item 4).  The cache key hashes, in
order: canonicalized computation IR, jaxlib version, backend platform +
platform_version, XLA flags (env ``XLA_FLAGS`` + ``LIBTPU_INIT_ARGS``),
serialized CompileOptions, and the serialized device topology.  Any of
these that is *ephemeral on this rig* (a remote-TPU tunnel) produces a new
key per session and silently defeats the cache.

This script compiles one fixed tiny graph, computes the cache key and the
per-ingredient hashes the same way jax._src.cache_key.get does, and prints
them as JSON.  Run it twice in fresh processes and diff the output;
ingredient hashes that differ across runs are the root cause.

Run: PYTHONPATH=/root/.axon_site:. python scripts/diag_cache_key.py
"""

from __future__ import annotations

import hashlib
import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from jax._src import cache_key
    from jax._src.lib import xla_client

    from jax._src import xla_bridge

    dev = jax.devices()[0]
    backend = xla_bridge.get_backend()

    # One fixed computation, lowered (not compiled) so we get the IR module.
    def f(x):
        return jnp.sin(x) @ x.T

    lowered = jax.jit(f).lower(jnp.zeros((128, 128), jnp.bfloat16))
    module = lowered.compiler_ir("stablehlo")
    compile_options = lowered.compile_args["compile_options"] if hasattr(
        lowered, "compile_args"
    ) else None
    if compile_options is None:
        from jax._src import compiler

        compile_options = compiler.get_compile_options(
            num_replicas=1, num_partitions=1
        )

    devices = np.asarray([dev])

    def ingredient(fn) -> str:
        h = hashlib.sha256()
        fn(h)
        return h.digest().hex()[:16]

    out: dict[str, object] = {
        "pid": os.getpid(),
        "jaxlib": jax.__version__,
        "platform": backend.platform,
        "platform_version": backend.platform_version,
        "device_kind": dev.device_kind,
        "XLA_FLAGS": os.environ.get("XLA_FLAGS"),
        "LIBTPU_INIT_ARGS": os.environ.get("LIBTPU_INIT_ARGS"),
    }

    out["h_computation"] = ingredient(
        lambda h: cache_key._hash_computation(
            h, module, cache_key.IgnoreCallbacks.NO
        )
    )
    out["h_platform"] = ingredient(
        lambda h: cache_key._hash_platform(h, backend)
    )
    out["h_xla_flags"] = ingredient(
        lambda h: cache_key._hash_xla_flags(h, cache_key.get_flag_prefixes())
    )
    out["h_compile_options"] = ingredient(
        lambda h: cache_key._hash_serialized_compile_options(
            h, compile_options
        )
    )
    out["h_accelerator_config"] = ingredient(
        lambda h: cache_key._hash_accelerator_config(h, devices)
    )
    try:
        topo = xla_client.get_topology_for_devices([dev]).serialize()
        out["topology_sha"] = hashlib.sha256(topo).hexdigest()[:16]
        out["topology_len"] = len(topo)
    except Exception as e:  # noqa: BLE001 - diagnostic
        out["topology_sha"] = f"unserializable: {type(e).__name__}: {e}"

    out["cache_key"] = cache_key.get(
        module, devices, compile_options, backend
    )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
