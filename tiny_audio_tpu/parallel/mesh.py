"""Device mesh + sharding rules for multi-chip execution.

The reference is single-GPU (SURVEY.md §2.5: no distributed backend); the
TPU-native scaling path is GSPMD: build a ``Mesh`` with ``dp`` (data) and
``tp`` (tensor) axes, annotate parameter/activation shardings, and let XLA
insert the collectives over ICI.

Sharding layout (regex path rules -> PartitionSpec):
- attention/FFN projection kernels: shard the head/FFN dimension over ``tp``
  (output dim for in-projections, input dim for out-projections) so each chip
  holds a head/FFN slice and the block needs one psum per sublayer;
- embeddings / lm_head: vocab over ``tp``;
- norms, convs, projector: replicated (tiny);
- activations/batch: ``dp``.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    dp: Optional[int] = None,
    tp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"mesh dp*tp={dp * tp} != device count {n}")
    return Mesh(np.asarray(devices).reshape(dp, tp), axis_names=("dp", "tp"))


# (regex on 'tower/flattened/param/path', PartitionSpec) — first match wins.
# Decoder kernels are stacked [L, in, out] (scan-over-layers), so the sharded
# matmul dim is axis 1 or 2.
_PARAM_RULES: list[tuple[str, P]] = [
    # Decoder attention & MLP in-projections: shard output dim
    (r"decoder/.*(q_proj|k_proj|v_proj|gate_proj|up_proj)/kernel", P(None, None, "tp")),
    # Decoder out-projections: shard input dim
    (r"decoder/.*(o_proj|down_proj)/kernel", P(None, "tp", None)),
    # Decoder embeddings: vocab over tp
    (r"decoder/embed_tokens/embedding", P("tp", None)),
    (r"decoder/lm_head/kernel", P(None, "tp")),
    # Encoder attention & MLP (stacked [L, in, out])
    (r"encoder/.*(q_proj|k_proj|v_proj|fc1)/kernel", P(None, None, "tp")),
    (r"encoder/.*(out_proj|fc2)/kernel", P(None, "tp", None)),
    (r"encoder/.*(q_proj|v_proj|fc1)/bias", P(None, "tp")),
    # MoE projector: stacked experts [E, ...] sharded over tp (expert
    # parallelism — each chip holds E/tp experts; the dense-dispatch einsum
    # partitions on the expert axis with one reduce at the gate sum)
    (r"projector/experts_fc\d_kernel", P("tp", None, None)),
    (r"projector/experts_fc\d_bias", P("tp", None)),
    # Everything else replicated
    (r".*", P()),
]


def param_pspec(path: str) -> P:
    for pattern, spec in _PARAM_RULES:
        if re.fullmatch(pattern, path):
            return spec
    return P()


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def param_shardings(params, mesh: Mesh):
    """PartitionSpec pytree for a {encoder, decoder, projector} param tree."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_pspec(_path_str(path))), params
    )


def shard_params(params, mesh: Mesh):
    """Place params on the mesh according to the rules."""
    return jax.tree_util.tree_map(
        jax.device_put, params, param_shardings(params, mesh)
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data parallelism for batch pytrees."""
    return NamedSharding(mesh, P("dp"))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)
