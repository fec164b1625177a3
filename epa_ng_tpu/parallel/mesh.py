"""Multi-chip sharded placement: mesh construction and the fully-jitted
placement step.

Parallelization axes (replacing the reference's MPI data parallelism +
OpenMP, SURVEY §2.3):

- ``dp``: queries are data-parallel (the reference's rank-sharded query
  streams, src/net/epa_mpi_util.cpp:10-30),
- ``ep``: edges are model-parallel — the preplacement lookup tensor and the
  edge CLV tensors are sharded across devices, so trees whose CLV set
  exceeds one chip's HBM spread over the slice (the TPU answer to the
  reference's out-of-core -b paging mode, src/tree/Tree.cpp:80-117).

Shardings are expressed with ``jax.sharding.NamedSharding``; XLA inserts the
all-gathers/reduce-scatters (scores ride the ICI, candidate-edge CLV
gathers cross the ``ep`` axis).

The fully-jitted :func:`placement_step` is the engine's hot loop as ONE
XLA computation (preplace -> top-k select -> batched Newton -> LWR); the
host engine uses it chunk by chunk, and the driver's multi-chip dryrun
compiles it over an N-device mesh. On a single TPU chip the Newton stage
dispatches to the VMEM-resident Pallas kernel (``use_pallas=True``); the
sharded/CPU/AA/p-inv paths use the XLA kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# TPU matmuls downcast f32 operands to bf16 by default; the chained CLV
# contractions need full f32 precision (bf16 error compounds across ~tree
# depth products and corrupts logls on large trees).
_PP = jax.lax.Precision.HIGHEST

from epa_ng_tpu.ops import newton


def make_mesh(n_dp: int, n_ep: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_dp * n_ep > len(devices):
        raise ValueError(
            f"mesh {n_dp}x{n_ep} needs {n_dp * n_ep} devices, "
            f"have {len(devices)}")
    grid = np.asarray(devices[: n_dp * n_ep]).reshape(n_dp, n_ep)
    return Mesh(grid, axis_names=("dp", "ep"))


@partial(jax.jit, static_argnames=("topk", "sliding", "site_width", "packed",
                                   "use_pallas", "block_width"))
def placement_step(consts: newton.EigConsts, table, tU, tV, ls, lengths,
                   codes, begins, spans, tQ, invq, prescoring_threshold,
                   topk: int = 8, sliding: bool = True,
                   site_width: int | None = None, packed: bool = False,
                   use_pallas: bool = False, block_offs=None,
                   block_width: int | None = None):
    """One fused placement step over a query chunk.

    table: [E,C,S] preplacement lookup; tU, tV: [E,RK,S] eigen-transformed
    edge CLVs with combined log-scale ls: [E,S] (newton.transform_edges);
    codes: [Q,S]; tQ: [Q,K,S] eigen-transformed query tips
    (newton.transform_queries); invq: [Q,S] p-inv log term. Returns per
    query the top-k candidate (edges, logl, lwr, pendant, distal,
    valid-mask), all [Q,topk].

    ``site_width``: static window width (>= every query's valid-range span)
    for the thorough stage; the Newton batch then computes only a
    per-query site window instead of the full alignment — the short-read
    premasking payoff. None = full width.
    """
    dtype = table.dtype
    E, C, S = table.shape

    # --- preplacement scores: masked one-hot MXU contraction
    # (precision-split like ops.lookup.preplace_scores)
    onehot = (codes[:, None, :] == jnp.arange(C)[None, :, None])
    onehot = onehot.astype(dtype)
    site = jnp.arange(S)
    in_range = ((site[None, :] >= begins[:, None])
                & (site[None, :] < (begins + spans)[:, None]))
    in_range_f = in_range.astype(dtype)
    onehot = onehot * in_range_f[:, None, :]
    mean = jnp.mean(table, axis=1)
    scores = (jnp.einsum("qcs,ecs->qe", onehot, table - mean[:, None, :],
                         preferred_element_type=dtype)
              + jnp.einsum("qs,es->qe", in_range_f, mean,
                           preferred_element_type=dtype, precision=_PP))

    # --- dynamic-heuristic candidate selection within a static top-k
    top_scores, top_edges = jax.lax.top_k(scores, topk)      # [Q,k]
    ex = jnp.exp(scores - top_scores[:, :1])
    denom = jnp.sum(ex, axis=1, keepdims=True)
    lwr_pre = jnp.exp(top_scores - top_scores[:, :1]) / denom
    prefix = jnp.cumsum(lwr_pre, axis=1) - lwr_pre
    valid = prefix < prescoring_threshold                    # [Q,k]

    # --- thorough placement on all (query, top-k edge) pairs
    Q = codes.shape[0]
    flat_e = top_edges.reshape(-1)
    RK = tU.shape[1]
    Kst = tQ.shape[1]

    if use_pallas and block_offs is not None:
        # blocked-window path: fast full-row gathers; each Pallas
        # pair-block DMAs only its own site window (queries must arrive
        # sorted by range begin — ops.pallas_blo.plan_blocks)
        from epa_ng_tpu.ops.pallas_blo import (
            PB, blo_optimize_batch_pallas_blocked)
        B = Q * topk
        NP = block_offs.shape[0] * PB
        q_ids = jnp.repeat(jnp.arange(Q), topk)
        if NP > B:
            flat_e_p = jnp.concatenate(
                [flat_e, jnp.repeat(flat_e[-1:], NP - B)])
            q_ids_p = jnp.concatenate(
                [q_ids, jnp.repeat(q_ids[-1:], NP - B)])
        else:
            flat_e_p, q_ids_p = flat_e, q_ids
        tUg = tU[flat_e_p]
        tVg = tV[flat_e_p]
        tQg = tQ[q_ids_p]
        pb = begins[q_ids_p]
        pe = pb + spans[q_ids_p]
        fullmask = ((site[None, :] >= pb[:, None])
                    & (site[None, :] < pe[:, None])).astype(dtype)
        ls_sum = jnp.sum(fullmask * ls[flat_e_p], axis=1)
        local = pb - jnp.repeat(block_offs, PB)
        wsite = jnp.arange(block_width)
        bmask = ((wsite[None, :] >= local[:, None])
                 & (wsite[None, :] < (local + spans[q_ids_p])[:, None]))
        logl, pendant, distal_rep, _, _, _ = (
            blo_optimize_batch_pallas_blocked(
                consts, tUg, tVg, tQg, bmask.astype(dtype),
                lengths[flat_e_p], block_offs, ls_sum,
                block_width=block_width))
        logl = logl[:B].reshape(Q, topk)
        pendant = pendant[:B].reshape(Q, topk)
        distal = distal_rep[:B].reshape(Q, topk)
        return _step_epilogue(top_edges, logl, pendant, distal, valid,
                              dtype, packed)

    W = S if site_width is None else min(site_width, S)
    win_begin = jnp.minimum(begins, S - W)
    local_begin = begins - win_begin

    def pair(qi, e):
        b = win_begin[qi].astype(jnp.int32)
        zero = jnp.zeros((), jnp.int32)
        tu = jax.lax.dynamic_slice(tU[e], (zero, b), (RK, W))
        tv = jax.lax.dynamic_slice(tV[e], (zero, b), (RK, W))
        tq = jax.lax.dynamic_slice(tQ[qi], (zero, b), (Kst, W))
        l = jax.lax.dynamic_slice(ls[e], (b,), (W,))
        iv = jax.lax.dynamic_slice(invq[qi], (b,), (W,))
        wsite = jnp.arange(W)
        m = ((wsite >= local_begin[qi])
             & (wsite < local_begin[qi] + spans[qi])).astype(dtype)
        return (tu, tv, tq, l, m, lengths[e], iv)

    q_ids = jnp.repeat(jnp.arange(Q), topk)
    args = jax.vmap(pair)(q_ids, flat_e)
    # materialize the gathered pair tensors once; otherwise XLA fuses the
    # edge gathers into every consumer inside the Newton loops
    args = jax.lax.optimization_barrier(args)
    if use_pallas:
        from epa_ng_tpu.ops.pallas_blo import blo_optimize_batch_pallas
        tu, tv, tq, l, m, olen, iv = args
        logl, pendant, distal_rep, _, _, _ = blo_optimize_batch_pallas(
            consts, tu, tv, tq, l, m, olen, iv)
    else:
        logl, pendant, distal_rep, _, _, _ = newton.blo_optimize_batch(
            consts, *args, sliding=sliding)

    logl = logl.reshape(Q, topk)
    pendant = pendant.reshape(Q, topk)
    distal = distal_rep.reshape(Q, topk)
    return _step_epilogue(top_edges, logl, pendant, distal, valid, dtype,
                          packed)


def _step_epilogue(top_edges, logl, pendant, distal, valid, dtype,
                   packed: bool):
    # --- LWR over the valid candidates
    neg_inf = jnp.asarray(-jnp.inf, dtype)
    masked_logl = jnp.where(valid, logl, neg_inf)
    m = jnp.max(masked_logl, axis=1, keepdims=True)
    exl = jnp.where(valid, jnp.exp(masked_logl - m), 0.0)
    lwr = exl / jnp.sum(exl, axis=1, keepdims=True)

    if packed:
        # one [6, Q, topk] array => a single device->host transfer
        return jnp.stack([top_edges.astype(dtype), logl, lwr, pendant,
                          distal, valid.astype(dtype)])
    return top_edges, logl, lwr, pendant, distal, valid


class ShardedPlacement:
    """Places the engine's tensors on a (dp, ep) mesh and runs the fused
    placement step with sharded inputs/outputs."""

    def __init__(self, engine, mesh: Mesh, topk: int = 8):
        self.engine = engine
        self.mesh = mesh
        self.topk = topk

        edge_sh = NamedSharding(mesh, P("ep"))
        repl = NamedSharding(mesh, P())
        blo = engine.blo
        n_ep = mesh.shape["ep"]
        E = blo.tU.shape[0]
        pad = (-E) % n_ep  # the edge count (2T-3) is odd; pad for sharding

        def pad_e(x, fill=None):
            if pad == 0:
                return x
            if fill is None:  # repeat edge 0 (never selected, see table pad)
                tail = jnp.repeat(x[:1], pad, axis=0)
            else:
                tail = jnp.full((pad,) + x.shape[1:], fill, x.dtype)
            return jnp.concatenate([x, tail], axis=0)

        table = engine.lookup_table
        # padded pseudo-edges get a -huge score so top-k never picks them.
        # The value must survive sums over sites/chars without overflowing
        # to -inf (which would poison the precision-split mean with NaN).
        table = pad_e(table, fill=jnp.asarray(-1e30, table.dtype))
        self.table = jax.device_put(table, edge_sh)
        self.tU = jax.device_put(pad_e(blo.tU), edge_sh)
        self.tV = jax.device_put(pad_e(blo.tV), edge_sh)
        self.ls = jax.device_put(pad_e(blo.ls), edge_sh)
        self.lengths = jax.device_put(pad_e(blo.lengths), edge_sh)
        self.consts = jax.device_put(engine.consts, repl)
        self.qspec = NamedSharding(mesh, P("dp"))

    def step(self, codes, begins, spans, tQ, invq):
        put = partial(jax.device_put, device=self.qspec)
        return placement_step(
            self.consts, self.table, self.tU, self.tV, self.ls,
            self.lengths, put(codes), put(begins), put(spans), put(tQ),
            put(invq),
            jnp.asarray(self.engine.options.prescoring_threshold,
                        self.table.dtype),
            topk=self.topk, sliding=self.engine.options.sliding_blo,
            site_width=chunk_site_width(spans, self.tU.shape[2]))


def chunk_site_width(spans, num_sites: int) -> int:
    """Power-of-two window width covering every span in the chunk."""
    max_span = int(np.max(np.asarray(spans))) if len(spans) else num_sites
    w = 64
    while w < max_span:
        w *= 2
    return min(w, num_sites)
