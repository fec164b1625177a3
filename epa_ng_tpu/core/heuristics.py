"""Candidate-edge selection after preplacement.

The three heuristics of the reference (src/core/heuristics.hpp:66-117),
reformulated as dense sort + cumulative-sum masks over the [queries, edges]
preplacement score matrix:

- dynamic (default): keep best edges while the accumulated LWR of the
  previously kept ones is below the threshold (default 0.99999),
- fixed: keep the top ceil(x * edges) edges by LWR,
- baseball: keep edges within 3 logl units of the best ("strike box") plus
  up to 6 more, at most 40 total.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from epa_ng_tpu.utils.options import Options


@partial(jax.jit, static_argnames=("mode",))
def candidate_mask(scores: jnp.ndarray, threshold, mode: str = "dynamic"):
    """[Q, E] bool mask of candidate edges per query.

    scores: [Q, E] preplacement log-likelihoods.
    """
    Q, E = scores.shape
    order = jnp.argsort(-scores, axis=1)
    sorted_scores = jnp.take_along_axis(scores, order, axis=1)

    if mode == "dynamic":
        # per-query LWR softmax, then keep while prefix-sum < threshold
        m = sorted_scores[:, :1]
        ex = jnp.exp(sorted_scores - m)
        lwr = ex / jnp.sum(ex, axis=1, keepdims=True)
        prefix = jnp.cumsum(lwr, axis=1) - lwr
        keep_sorted = prefix < threshold
    elif mode == "fixed":
        num_keep = jnp.ceil(threshold * E).astype(jnp.int32)
        keep_sorted = jnp.arange(E)[None, :] < num_keep
    elif mode == "baseball":
        strike_box, max_strikes, max_pitches = 3.0, 6, 40
        best = sorted_scores[:, :1]
        hits = jnp.sum(sorted_scores >= best - strike_box, axis=1,
                       keepdims=True)
        total = jnp.minimum(hits + max_strikes, max_pitches)
        keep_sorted = jnp.arange(E)[None, :] < total
    else:
        raise ValueError(f"unknown heuristic mode: {mode}")

    keep_sorted = jnp.broadcast_to(keep_sorted, (Q, E))
    mask = jnp.zeros((Q, E), dtype=bool)
    mask = jax.vmap(lambda m_, o_, k_: m_.at[o_].set(k_))(
        mask, order, keep_sorted)
    return mask


def heuristic_mode(options: Options) -> str:
    if options.baseball:
        return "baseball"
    if options.prescoring_by_percentage:
        return "fixed"
    return "dynamic"


def select_work(scores: np.ndarray, options: Options):
    """Host-side compaction: dense mask -> sorted (edge-major) pair arrays.

    Returns (edge_ids[P], query_ids[P]) sorted by edge (the reference
    iterates Work branch-major so thread-local Tiny_Trees are reused;
    here edge-major order maximizes gather locality in the BLO batch).
    """
    mask = np.asarray(candidate_mask(
        jnp.asarray(scores), options.prescoring_threshold,
        heuristic_mode(options)))
    eq = np.nonzero(mask.T)  # edge-major
    return eq[0].astype(np.int32), eq[1].astype(np.int32)


def all_work(num_queries: int, num_edges: int):
    """The --no-heur work list: every (edge, query) pair."""
    e = np.repeat(np.arange(num_edges, dtype=np.int32), num_queries)
    q = np.tile(np.arange(num_queries, dtype=np.int32), num_edges)
    return e, q
