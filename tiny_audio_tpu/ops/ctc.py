"""CTC forced-alignment trellis as a lax.scan (TPU-friendly Viterbi).

The reference builds the trellis with a doubly-nested Python loop
(``/root/reference/tiny_audio/alignment.py:48-78`` — its documented hot spot);
here each time step is one vectorized update over all token positions inside
``lax.scan``, and the backtrack runs over the recorded move decisions.

Semantics (identical to the reference):
    trellis[t+1, j] = max(trellis[t, j]   + emission[t, blank],      # stay
                          trellis[t, j-1] + emission[t, tokens[j-1]]) # move
with trellis[0, 0] = 0, everything else -inf.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


@jax.jit
def ctc_trellis(emission: jax.Array, tokens: jax.Array, blank_id: int = 0):
    """Viterbi trellis + move decisions.

    Args:
        emission: [T, C] log-probabilities.
        tokens: [N] int32 target token ids.

    Returns:
        (trellis [T+1, N+1] float32, moved [T, N+1] bool) where ``moved[t, j]``
        records whether the best path into (t+1, j) consumed token j-1 at
        frame t.
    """
    n_tokens = tokens.shape[0]

    init = jnp.full((n_tokens + 1,), NEG_INF, jnp.float32).at[0].set(0.0)

    def step(prev, emission_t):
        stay = prev + emission_t[blank_id]
        tok_scores = emission_t[tokens]  # [N]
        move = jnp.concatenate(
            [jnp.array([NEG_INF], jnp.float32), prev[:-1] + tok_scores]
        )
        moved = move >= stay  # ties prefer move (reference backtrack >=)
        nxt = jnp.maximum(stay, move)
        return nxt, (nxt, moved)

    _, (rows, moved) = jax.lax.scan(step, init, emission.astype(jnp.float32))
    trellis = jnp.concatenate([init[None, :], rows], axis=0)
    return trellis, moved


def ctc_backtrack(
    trellis: np.ndarray,
    moved: np.ndarray,
    tokens: np.ndarray,
) -> list[tuple[int, float, float]]:
    """Backtrack move decisions into per-token (token_id, start_f, end_f) spans.

    Monotonic, every token emitted exactly once; uniform fallback when the
    trellis never reached the final state (reference alignment.py:100-107).
    """
    t_frames = trellis.shape[0] - 1
    n_tokens = len(tokens)
    if n_tokens == 0:
        return []

    if trellis[t_frames, n_tokens] <= NEG_INF / 2:
        per = t_frames / n_tokens
        return [(int(tokens[i]), i * per, (i + 1) * per) for i in range(n_tokens)]

    # A reachable (T, N) final state always consumes every token on the way
    # back to t=0 (each backtrack step either moves j down or t down, and
    # the reachability check above guarantees a full path exists), so every
    # token_frames[j] is non-empty here.
    token_frames: list[list[int]] = [[] for _ in range(n_tokens)]
    t, j = t_frames, n_tokens
    while t > 0 and j > 0:
        if moved[t - 1, j]:
            token_frames[j - 1].append(t - 1)
            j -= 1
        t -= 1

    spans: list[tuple[int, float, float]] = []
    for idx, frames in enumerate(token_frames):
        if not frames:
            # Unreachable for a (trellis, moved) pair from the same forward
            # pass (see invariant above); a mismatched pair from different
            # runs should fail loudly, not with a bare min() ValueError.
            raise ValueError(
                f"ctc_backtrack: token {idx} got no frames — trellis/moved "
                "matrices are inconsistent (were they produced together?)"
            )
        start = float(min(frames))
        end = float(max(frames)) + 1.0
        spans.append((int(tokens[idx]), start, end))
    return spans
