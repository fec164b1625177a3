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
host engine uses it chunk by chunk. The mesh path runs the shard_map'd
twin (:func:`_spmd_step_body`), where every device executes the same
single-chip program on its local shard. On TPU the Newton stage
dispatches to the VMEM-resident Pallas kernel (``use_pallas=True``: DNA,
AA, matrix-mixture and +I instantiations); CPU and f64 paths use the
XLA kernel.
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


# one shared implementation of the preplacement contraction (the fused
# step and the exact path must rank candidates identically)
from epa_ng_tpu.ops.lookup import preplace_scores_core as _preplace_scores


def _select_topk(scores, threshold, topk: int, mode: str = "dynamic"):
    """Heuristic candidate cut within a static top-k budget: returns
    (top_edges [Q,k] int32, valid [Q,k] bool prefix mask, top_scores).

    - dynamic: valid marks the prefix kept by the accumulated-LWR rule
      (reference dynamic_heuristic, src/core/heuristics.hpp:66-88; same
      prefix-excludes-own-LWR convention as core.heuristics.candidate_mask).
      May saturate the budget (the engine re-runs those queries wider).
    - fixed: top ceil(threshold * E) edges; the engine sizes topk to
      exactly that count, so valid is all-ones (heuristics.hpp:90-99).
    - baseball: hits = edges within strike_box=3 logl of the best, keep
      min(hits + max_strikes=6, max_pitches=40); exact within a 40-budget
      because every hit outranks every non-hit (heuristics.hpp:101-117).
    """
    top_scores, top_edges = jax.lax.top_k(scores, topk)      # [Q,k]
    if mode == "dynamic":
        ex = jnp.exp(scores - top_scores[:, :1])
        denom = jnp.sum(ex, axis=1, keepdims=True)
        lwr_pre = jnp.exp(top_scores - top_scores[:, :1]) / denom
        prefix = jnp.cumsum(lwr_pre, axis=1) - lwr_pre
        valid = prefix < threshold                           # [Q,k]
    elif mode == "fixed":
        valid = jnp.ones(top_scores.shape, bool)
    elif mode == "baseball":
        strike_box, max_strikes, max_pitches = 3.0, 6, 40
        hits = jnp.sum(top_scores >= top_scores[:, :1] - strike_box,
                       axis=1, keepdims=True)
        total = jnp.minimum(hits + max_strikes, max_pitches)
        valid = jnp.arange(topk)[None, :] < total
    else:
        raise ValueError(f"unknown heuristic mode: {mode}")
    return top_edges.astype(jnp.int32), valid, top_scores


@partial(jax.jit, static_argnames=("topk",))
def preplace_select(table, codes, begins, spans, threshold, topk: int):
    """Dispatch half of the two-phase fast path: preplacement scores +
    dynamic-heuristic candidate cut on device; only the [Q, topk] candidate
    ids/mask transfer to the host, which compacts the (query, edge) pairs
    for the blocked Newton dispatch (engine._thorough). Splitting here (vs
    the single fused placement_step) lets the thorough stage run on ~the
    valid pairs only — with the reference's default 0.99999 accumulated-LWR
    threshold roughly half the static top-k budget is invalid."""
    scores = _preplace_scores(table, codes, begins, spans)
    top_edges, valid, _ = _select_topk(scores, threshold, topk)
    return top_edges, valid


@partial(jax.jit, static_argnames=("topk", "sliding", "site_width", "packed",
                                   "use_pallas", "block_width", "phase1",
                                   "filter_cfg", "heur_mode", "has_pinv"))
def placement_step(consts: newton.EigConsts, table, tU, tV, ls, lengths,
                   codes, begins, spans, tQ, invq, prescoring_threshold,
                   topk: int = 8, sliding: bool = True,
                   site_width: int | None = None, packed: bool = False,
                   use_pallas: bool = False,
                   block_width: int | None = None,
                   phase1: int = 3,
                   filter_cfg: tuple | None = None,
                   filter_threshold=0.0,
                   heur_mode: str = "dynamic",
                   has_pinv: bool = False):
    """One fused placement step over a query chunk.

    table: [E,C,S] preplacement lookup; tU, tV: [E,RK,S] eigen-transformed
    edge CLVs with combined log-scale ls: [E,S] (newton.transform_edges);
    codes: [Q,S]; tQ: [Q,K,S] eigen-transformed query tips
    (newton.transform_queries); invq: [Q,S] p-inv log term. Returns per
    query the top-k candidate (edges, logl, lwr, pendant, distal,
    valid-mask, computed-mask), all [Q,topk].

    ``site_width``: static window width (>= every query's valid-range span)
    for the thorough stage; the Newton batch then computes only a
    per-query site window instead of the full alignment — the short-read
    premasking payoff. None = full width. ``block_width``: static window
    width of the blocked Pallas path (ops.pallas_blo.plan_blocks); block
    site offsets are planned on device after the candidate compaction.

    ``phase1``: two-phase convergence compaction inside the blocked Pallas
    path. The 128-pair blocks run the smoothing loop in lock-step, so one
    straggler drags its whole block to its own iteration count; most
    pairs converge (or roll back) within a few smoothings. Phase A runs
    everything with this small cap, then the unconverged pairs (their
    convergence difficulty is spread evenly over blocks) are compacted on
    device into a small pair budget (NP/4) that reruns with the full
    smoothing budget. Default 3: re-tuned after the r05 flat-region
    stopping rules cut the inner iteration counts (interleaved A/B on
    the headline shape: phase1=3 ~92-94k q/s vs phase1=2 ~89-91k). Restarting is trajectory-identical to one long run:
    the smoothing recursion is deterministic from the fixed init. Pairs
    that exceed the phase-B budget (never seen in practice) are flagged
    uncomputed and the engine re-places their queries exactly.
    """
    dtype = tU.dtype
    E, C, S = table[0].shape if isinstance(table, tuple) else table.shape
    site = jnp.arange(S)

    scores = _preplace_scores(table, codes, begins, spans)

    # --- heuristic candidate selection within a static top-k
    top_edges, valid, _ = _select_topk(scores, prescoring_threshold, topk,
                                       heur_mode)

    # --- thorough placement on all (query, top-k edge) pairs
    Q = codes.shape[0]
    flat_e = top_edges.reshape(-1)
    RK = tU.shape[1]
    Kst = tQ.shape[1]

    if use_pallas and block_width is not None:
        q_ids0 = jnp.repeat(jnp.arange(Q), topk)
        logl, pendant, distal, computed = _newton_blocked_pallas(
            consts, tU, tV, ls, lengths, tQ, flat_e, q_ids0,
            valid.reshape(-1), begins, spans, block_width,
            halve_budget=(heur_mode == "dynamic"), phase1=phase1,
            invq=invq, has_pinv=has_pinv)
        logl = logl.reshape(Q, topk)
        pendant = pendant.reshape(Q, topk)
        distal = distal.reshape(Q, topk)
        computed = computed.reshape(Q, topk)
        return _step_epilogue(top_edges, logl, pendant, distal, valid,
                              dtype, packed, computed=computed,
                              filter_cfg=filter_cfg,
                              filter_threshold=filter_threshold,
                              dynamic_budget=(heur_mode == "dynamic"))

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
    computed = None
    if use_pallas:
        from epa_ng_tpu.ops.pallas_blo import blo_optimize_batch_pallas
        tu, tv, tq, l, m, olen, iv = args
        logl, pendant, distal_rep, _, _, _ = blo_optimize_batch_pallas(
            consts, tu, tv, tq, l, m, olen, iv)
    else:
        # two-phase convergence compaction, XLA-kernel edition: under
        # vmap the smoothing while_loop runs lock-step until the SLOWEST
        # pair of the whole batch converges, so one straggler drags B
        # pairs x [RK, W] of HBM traffic to 32 iterations. Run everything
        # with a tiny cap, then rerun only the unconverged tail (compacted
        # on device into a B/4 budget) with the full budget — the same
        # trick the blocked Pallas path plays per 128-pair block. This is
        # the hot path off-TPU, for f64/raxml-blo runs, and for the
        # wide-budget redo step (AA/mixture/+I now ride the Pallas
        # instantiations when supported).
        B = Q * topk
        max_sm = newton.SMOOTHINGS
        two_phase = bool(phase1) and phase1 < max_sm and B >= 256
        p1 = phase1 if two_phase else max_sm
        logl, pendant, distal_rep, _, _, done = newton.blo_optimize_batch(
            consts, *args, sliding=sliding, max_smoothings=p1)
        if two_phase:
            flat_valid = valid.reshape(-1)
            unconv = flat_valid & ~done
            NB = min(B, max(B // 4, 128))
            key = jnp.where(unconv, 0, B) + jnp.arange(B)
            idx2 = jnp.argsort(key)[:NB]
            fits2 = unconv[idx2]
            args2 = jax.tree_util.tree_map(lambda a: a[idx2], args)
            loglB, pendB, distB, _, _, _ = newton.blo_optimize_batch(
                consts, *args2, sliding=sliding, max_smoothings=max_sm)
            logl = logl.at[idx2].set(jnp.where(fits2, loglB, logl[idx2]))
            pendant = pendant.at[idx2].set(
                jnp.where(fits2, pendB, pendant[idx2]))
            distal_rep = distal_rep.at[idx2].set(
                jnp.where(fits2, distB, distal_rep[idx2]))
            handled = jnp.zeros((B,), bool).at[idx2].set(fits2)
            # a valid pair that neither converged in phase A nor fit the
            # phase-B budget is flagged uncomputed -> exact re-place
            computed = ((done | handled | ~flat_valid)
                        .astype(dtype).reshape(Q, topk))

    logl = logl.reshape(Q, topk)
    pendant = pendant.reshape(Q, topk)
    distal = distal_rep.reshape(Q, topk)
    return _step_epilogue(top_edges, logl, pendant, distal, valid, dtype,
                          packed, computed=computed,
                          filter_cfg=filter_cfg,
                          filter_threshold=filter_threshold,
                          dynamic_budget=(heur_mode == "dynamic"))


def _newton_blocked_pallas(consts, tU, tV, ls, lengths, tQ, flat_e, q_ids0,
                           live0, begins, spans, block_width: int,
                           halve_budget: bool, phase1: int,
                           invq=None, has_pinv: bool = False):
    """Blocked-Pallas Newton stage over a flat [B] (query, edge) pair list
    with in-dispatch candidate compaction: live pairs sort to the front
    (begin-ordered, so each 128-pair block covers a tight site window),
    dead pairs sink to the tail where whole blocks deactivate — with the
    default 0.99999 accumulated-LWR cut roughly half the static top-k
    budget is dead, and a host-side compaction would cost a device->host
    round trip per chunk instead (tens of ms through a TPU tunnel).

    ``flat_e`` indexes THIS STORE's edge axis (under shard_map: local
    ep-shard indices); ``live0`` marks pairs this dispatch must compute
    (under shard_map: valid AND owned by this shard). Returns flat [B]
    (logl, pendant, distal, computed) — computed is 0 for dead/evicted/
    budget-dropped slots, whose results are garbage and must be discarded.

    ``halve_budget`` is the dynamic pair-budget halving: only the first
    half of the sorted pair list is gathered/transposed/dispatched (the
    live fraction is measured at 21-46% on bench and evolved workloads,
    docs/PERF.md). A live pair landing beyond the halved budget is flagged
    uncomputed and its query re-runs through the engine's redo fallback.
    fixed/baseball budgets are exact (all pairs live), so they keep the
    full pair list.

    ``phase1``: two-phase convergence compaction. The 128-pair blocks run
    the smoothing loop in lock-step, so one straggler drags its whole
    block to its own iteration count; but most pairs converge (or roll
    back) within 2 smoothings. Phase A runs everything with this small
    cap, then the unconverged pairs are compacted on device into a small
    pair budget (NP/4) that reruns with the full smoothing budget.
    Restarting is trajectory-identical to one long run: the smoothing
    recursion is deterministic from the fixed init.
    """
    from epa_ng_tpu.ops.pallas_blo import (
        PB, blo_optimize_batch_pallas_blocked, max_kernel_sites)
    dtype = tU.dtype
    S = tU.shape[2]
    site = jnp.arange(S)
    B = flat_e.shape[0]
    if halve_budget:
        NP = max(PB, B // 2 // PB * PB)
    else:
        NP = -(-B // PB) * PB
    n_blocks = NP // PB
    Wb = block_width
    pb0 = begins[q_ids0].astype(jnp.int32)
    big = jnp.int32(1) << jnp.int32(24)
    order_full = jnp.argsort(jnp.where(live0, 0, big) + pb0)   # [B]
    if NP <= B:
        order = order_full[:NP]
    else:
        order = jnp.concatenate(
            [order_full, jnp.repeat(order_full[-1:], NP - B)])

    flat_e_p = flat_e[order]
    q_ids_p = q_ids0[order]
    pb_p = pb0[order]
    sp_p = spans[q_ids_p].astype(jnp.int32)
    live_p = live0[order]
    if NP > B:
        live_p = live_p.at[B:].set(False)

    # per-block window offsets from the LIVE pairs only (dead pairs'
    # windows are irrelevant — their results are discarded)
    S_pad = max(-(-S // 128) * 128, Wb)
    pbm = jnp.where(live_p, pb_p, big).reshape(n_blocks, PB)
    offs = (jnp.min(pbm, axis=1) // 8) * 8
    offs = jnp.clip(offs, 0, S_pad - Wb).astype(jnp.int32)
    local = pb_p - jnp.repeat(offs, PB)
    # a live pair can only miss its block window when the block's
    # begin spread exceeds Wb (possible since Wb was planned for the
    # denser all-pairs ordering); such pairs are flagged uncomputed
    # and the engine re-runs them exactly (rare: none on typical
    # short-read chunks)
    fits = live_p & (local + sp_p <= Wb)
    block_active = jnp.any(fits.reshape(n_blocks, PB),
                           axis=1).astype(jnp.int32)
    tUg = tU[flat_e_p]
    tVg = tV[flat_e_p]
    tQg = tQ[q_ids_p]
    # +I models: per-(pair, site) linear invariant term in the kernel's
    # scaled space (the XLA path's pinv_lin, ops.newton.blo_optimize_batch)
    pv = jnp.exp(invq[q_ids_p] - ls[flat_e_p]) if has_pinv else None
    orig_p = lengths[flat_e_p]
    fullmask = ((site[None, :] >= pb_p[:, None])
                & (site[None, :] < (pb_p + sp_p)[:, None])).astype(dtype)
    ls_sum = jnp.sum(fullmask * ls[flat_e_p], axis=1)
    wsite = jnp.arange(Wb)
    bmask = ((wsite[None, :] >= local[:, None])
             & (wsite[None, :] < (local + sp_p)[:, None])
             & fits[:, None])
    max_sm = newton.SMOOTHINGS
    # phase B runs a min(S_pad, 2*Wb)-wide window, so it only needs THAT
    # inside the kernel's VMEM budget (wide alignments with narrow reads
    # two-phase fine)
    two_phase = (bool(phase1) and phase1 < max_sm and NP >= 4 * PB
                 and min(S_pad, max(2 * Wb, 128))
                 <= max_kernel_sites(tU.shape[1]))
    p1 = phase1 if two_phase else max_sm
    logl_s, pendant_s, distal_s, _, _, done_s = (
        blo_optimize_batch_pallas_blocked(
            consts, tUg, tVg, tQg, bmask.astype(dtype),
            orig_p, offs, ls_sum, block_width=Wb,
            max_smoothings=p1,
            skip=1.0 - fits.astype(dtype), block_active=block_active,
            pinv_lin=pv))
    computed_pair = fits
    if two_phase:
        # --- phase B: compact the unconverged tail (evenly spread
        # over blocks) into NP/4 pairs and rerun with the full budget
        unconv = fits & ~done_s
        NB = (NP // 4) // PB * PB
        key = jnp.where(unconv, 0, NP) + jnp.arange(NP)
        idx2 = jnp.argsort(key)[:NB]   # unconv first, begin order kept
        fits2 = unconv[idx2]
        pb2 = pb_p[idx2]
        sp2 = sp_p[idx2]
        nb2 = NB // PB
        # phase-B windows: the stragglers are a sparse begin-ordered
        # subsample, so each phase-B block's begin spread is ~(1/unconv
        # fraction) wider than phase A's. A doubled window absorbs that
        # in practice (the spread scales with the data's begin density,
        # the span term is unchanged); the rare straggler it evicts is
        # flagged uncomputed like any window misfit and re-placed
        # exactly. Falls back to full width when doubling wouldn't
        # actually save anything.
        Wb2 = min(S_pad, max(2 * Wb, 128))
        if Wb2 >= S_pad:
            Wb2 = S_pad
            offs2 = jnp.zeros((nb2,), jnp.int32)
        else:
            pbm2 = jnp.where(fits2, pb2, big).reshape(nb2, PB)
            offs2 = (jnp.min(pbm2, axis=1) // 8) * 8
            offs2 = jnp.clip(offs2, 0, S_pad - Wb2).astype(jnp.int32)
        local2 = pb2 - jnp.repeat(offs2, PB)
        fits2 = fits2 & (local2 + sp2 <= Wb2)
        act2 = jnp.any(fits2.reshape(nb2, PB), axis=1).astype(jnp.int32)
        w2site = jnp.arange(Wb2)
        bmask2 = ((w2site[None, :] >= local2[:, None])
                  & (w2site[None, :] < (local2 + sp2)[:, None])
                  & fits2[:, None])
        loglB, pendB, distB, _, _, _ = (
            blo_optimize_batch_pallas_blocked(
                consts, tUg[idx2], tVg[idx2], tQg[idx2],
                bmask2.astype(dtype), orig_p[idx2], offs2, ls_sum[idx2],
                block_width=Wb2, max_smoothings=max_sm,
                skip=1.0 - fits2.astype(dtype), block_active=act2,
                pinv_lin=None if pv is None else pv[idx2]))
        logl_s = logl_s.at[idx2].set(jnp.where(fits2, loglB,
                                               logl_s[idx2]))
        pendant_s = pendant_s.at[idx2].set(jnp.where(fits2, pendB,
                                                     pendant_s[idx2]))
        distal_s = distal_s.at[idx2].set(jnp.where(fits2, distB,
                                                   distal_s[idx2]))
        handled = jnp.zeros((NP,), bool).at[idx2].set(fits2)
        # phase-A stragglers that missed the phase-B budget (never
        # seen in practice) re-place exactly via the engine fallback
        computed_pair = fits & (done_s | handled)

    # scatter results back to [B] pair slots; slots never dispatched
    # (budget-halved tail) keep computed == 0 -> misfit redo
    m = min(NP, B)

    def unsort(x):
        return jnp.zeros((B,), x.dtype).at[order[:m]].set(x[:m])

    return (unsort(logl_s), unsort(pendant_s), unsort(distal_s),
            unsort(computed_pair.astype(dtype)))


def _step_epilogue(top_edges, logl, pendant, distal, valid, dtype,
                   packed: bool, computed=None, filter_cfg=None,
                   filter_threshold=0.0, dynamic_budget: bool = True):
    # --- LWR over the valid (and actually computed) candidates; a valid
    # pair the blocked kernel could not fit into its site window must not
    # poison the softmax — its query is re-run exactly by the engine
    if computed is None:
        computed = valid.astype(dtype)
    ok = valid & (computed > 0)
    neg_inf = jnp.asarray(-jnp.inf, dtype)
    masked_logl = jnp.where(ok, logl, neg_inf)
    m = jnp.max(masked_logl, axis=1, keepdims=True)
    exl = jnp.where(ok, jnp.exp(masked_logl - m), 0.0)
    lwr = exl / jnp.sum(exl, axis=1, keepdims=True)

    if filter_cfg is not None:
        # --- output filtering ON DEVICE (the analog of
        # set_manipulators.cpp:131-204 run on the host per pquery): sort
        # each query's candidates by LWR desc, then keep a prefix count by
        # the min-LWR / accumulated-LWR rule, clamped to
        # [min(fmin, n_ok), min(fmax, n_ok)]. The host then only slices.
        acc, fmin, fmax = filter_cfg
        order = jnp.argsort(-lwr, axis=1, stable=True)
        take = lambda x: jnp.take_along_axis(x, order, axis=1)
        edges_s, logl_s, lwr_s = take(top_edges), take(logl), take(lwr)
        pend_s, dist_s, ok_s = take(pendant), take(distal), take(ok)
        thr = jnp.asarray(filter_threshold, dtype)
        if acc:
            prefix = jnp.cumsum(lwr_s * ok_s, axis=1) - lwr_s * ok_s
            n_keep = jnp.sum((prefix < thr) & ok_s, axis=1)
        else:
            n_keep = jnp.sum((lwr_s > thr) & ok_s, axis=1)
        n_ok = jnp.sum(ok_s, axis=1)
        n_keep = jnp.clip(n_keep, jnp.minimum(fmin, n_ok),
                          jnp.minimum(fmax, n_ok))
        rank = jnp.cumsum(ok_s.astype(jnp.int32), axis=1) - 1
        keep = ok_s & (rank < n_keep[:, None])
        # an all-valid row only means "budget too small" under the
        # dynamic rule; fixed/baseball size the budget exactly
        if dynamic_budget:
            saturated = jnp.all(valid, axis=1)
        else:
            saturated = jnp.zeros(valid.shape[:1], bool)
        misfit = jnp.any(valid & ~(computed > 0), axis=1)
        flags = (saturated.astype(dtype)
                 + 2.0 * misfit.astype(dtype))[:, None]
        # at most filter_max rows survive per query and they sort to the
        # front — transfer only those columns to the host (the [7, Q, k]
        # result rides a ~20 MB/s tunnel in this environment). At least
        # one column always ships: the engine reads flags from column 0,
        # and a filter_max of 0 just keeps nothing (keep all-False).
        kf = max(1, min(keep.shape[1], int(fmax)))
        sl = lambda x: x[:, :kf]
        flags = jnp.broadcast_to(flags, (keep.shape[0], kf))
        return jnp.stack([sl(edges_s).astype(dtype), sl(logl_s),
                          sl(lwr_s), sl(pend_s), sl(dist_s),
                          sl(keep).astype(dtype), flags])

    if packed:
        # one [7, Q, topk] array => a single device->host transfer
        return jnp.stack([top_edges.astype(dtype), logl, lwr, pendant,
                          distal, valid.astype(dtype), computed])
    return top_edges, logl, lwr, pendant, distal, valid, computed


def _newton_xla_windowed_pairs(consts, tU, tV, ls, lengths, tQ, invq,
                               flat_e, q_ids0, live, begins, spans,
                               site_width, sliding: bool, phase1: int):
    """XLA-kernel Newton stage over a flat [B] pair list with per-pair
    site windows and two-phase convergence compaction — the fallback for
    everything the Pallas kernel does not cover (CPU, AA/mixture, p-inv,
    f64, raxml mode). Same contract as :func:`_newton_blocked_pallas`:
    ``flat_e`` indexes this store, ``live`` marks pairs to compute, and
    only slots with computed > 0 carry usable results."""
    dtype = tU.dtype
    S = tU.shape[2]
    RK = tU.shape[1]
    Kst = tQ.shape[1]
    B = flat_e.shape[0]
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

    args = jax.vmap(pair)(q_ids0, flat_e)
    # materialize the gathered pair tensors once; otherwise XLA fuses the
    # edge gathers into every consumer inside the Newton loops
    args = jax.lax.optimization_barrier(args)
    max_sm = newton.SMOOTHINGS
    # two-phase convergence compaction (see placement_step's XLA branch):
    # run everything with a tiny smoothing cap, then rerun only the
    # unconverged tail compacted into a B/4 budget with the full cap
    two_phase = bool(phase1) and phase1 < max_sm and B >= 256
    p1 = phase1 if two_phase else max_sm
    logl, pendant, distal_rep, _, _, done = newton.blo_optimize_batch(
        consts, *args, sliding=sliding, max_smoothings=p1)
    computed = live
    if two_phase:
        unconv = live & ~done
        NB = min(B, max(B // 4, 128))
        key = jnp.where(unconv, 0, B) + jnp.arange(B)
        idx2 = jnp.argsort(key)[:NB]
        fits2 = unconv[idx2]
        args2 = jax.tree_util.tree_map(lambda a: a[idx2], args)
        loglB, pendB, distB, _, _, _ = newton.blo_optimize_batch(
            consts, *args2, sliding=sliding, max_smoothings=max_sm)
        logl = logl.at[idx2].set(jnp.where(fits2, loglB, logl[idx2]))
        pendant = pendant.at[idx2].set(
            jnp.where(fits2, pendB, pendant[idx2]))
        distal_rep = distal_rep.at[idx2].set(
            jnp.where(fits2, distB, distal_rep[idx2]))
        handled = jnp.zeros((B,), bool).at[idx2].set(fits2)
        computed = live & (done | handled)
    return logl, pendant, distal_rep, computed.astype(dtype)


def _spmd_step_body(consts, table, tU, tV, ls, lengths, codes, begins,
                    spans, tQ, invq, threshold, filter_threshold, *,
                    n_ep: int, topk: int, sliding: bool, site_width,
                    use_pallas: bool, block_width, phase1: int,
                    filter_cfg, heur_mode: str, packed: bool,
                    has_pinv: bool = False):
    """Per-DEVICE body of the sharded placement step (runs under
    ``jax.shard_map`` over the (dp, ep) mesh). Each device sees its local
    query rows (dp shard) and its local edge rows (ep shard) and runs the
    SAME single-chip kernels the plain engine uses — including the
    blocked-Pallas Newton kernel with the pair-budget halving — matching
    the reference's distributed mode, which keeps its full SIMD kernels
    on every rank (src/core/place.cpp:64-171 under MPI).

    Cross-device traffic is exactly two small collectives on the ep axis:
    an all-gather of the per-shard top-k candidate (score, edge-id) pairs
    for the heuristic merge, and a psum of the [B]-pair Newton results
    (each pair is computed once, on the shard owning its edge's rows).
    The dp axis needs no communication at all.
    """
    dtype = tU.dtype
    El = tU.shape[0]          # local (ep-shard) edge rows
    Q = codes.shape[0]        # local (dp-shard) query rows
    ep_i = jax.lax.axis_index("ep")

    scores = _preplace_scores(table, codes, begins, spans)    # [Q, El]

    # --- heuristic candidate selection: local top-k, then a merge of the
    # ep shards' candidate lists (scores/ids only — the lookup tensors
    # themselves never move)
    kl = min(topk, El)
    ts_l, te_l = jax.lax.top_k(scores, kl)
    te_g = te_l.astype(jnp.int32) + (ep_i * El).astype(jnp.int32)
    if n_ep > 1:
        ts_all = jax.lax.all_gather(ts_l, "ep", axis=1, tiled=True)
        te_all = jax.lax.all_gather(te_g, "ep", axis=1, tiled=True)
    else:
        ts_all, te_all = ts_l, te_g
    top_scores, sel = jax.lax.top_k(ts_all, topk)
    top_edges = jnp.take_along_axis(te_all, sel, axis=1)

    if heur_mode == "dynamic":
        # same prefix-excludes-own-LWR rule as _select_topk; the softmax
        # denominator sums over ALL edges, psum'd across the ep shards
        m = top_scores[:, :1]
        denom = jnp.sum(jnp.exp(scores - m), axis=1)
        if n_ep > 1:
            denom = jax.lax.psum(denom, "ep")
        lwr_pre = jnp.exp(top_scores - m) / denom[:, None]
        prefix = jnp.cumsum(lwr_pre, axis=1) - lwr_pre
        valid = prefix < threshold
    elif heur_mode == "fixed":
        valid = jnp.ones(top_scores.shape, bool)
    elif heur_mode == "baseball":
        strike_box, max_strikes, max_pitches = 3.0, 6, 40
        hits = jnp.sum(top_scores >= top_scores[:, :1] - strike_box,
                       axis=1, keepdims=True)
        total = jnp.minimum(hits + max_strikes, max_pitches)
        valid = jnp.arange(topk)[None, :] < total
    else:
        raise ValueError(f"unknown heuristic mode: {heur_mode}")

    # --- owner-partitioned Newton: the ep shard holding an edge's BLO
    # rows computes its pairs (locally, with the single-chip kernel);
    # everyone else's lanes are dead and sort into inactive blocks
    flat_eg = top_edges.reshape(-1)
    mine = (flat_eg // El) == ep_i
    flat_e = jnp.where(mine, flat_eg - ep_i * El, 0)
    q_ids0 = jnp.repeat(jnp.arange(Q), topk)
    live = valid.reshape(-1) & mine

    if use_pallas and block_width is not None:
        logl, pendant, distal, computed = _newton_blocked_pallas(
            consts, tU, tV, ls, lengths, tQ, flat_e, q_ids0, live,
            begins, spans, block_width,
            halve_budget=(heur_mode == "dynamic"), phase1=phase1,
            invq=invq, has_pinv=has_pinv)
    else:
        logl, pendant, distal, computed = _newton_xla_windowed_pairs(
            consts, tU, tV, ls, lengths, tQ, invq, flat_e, q_ids0, live,
            begins, spans, site_width, sliding, phase1)

    if n_ep > 1:
        # every pair was computed on exactly one shard; non-computed slots
        # hold garbage (frozen kernel lanes), so zero them before the sum
        z = lambda x: jnp.where(computed > 0, x, 0).astype(dtype)
        logl, pendant, distal, computed = jax.lax.psum(
            (z(logl), z(pendant), z(distal), computed.astype(dtype)), "ep")

    sh = (Q, topk)
    return _step_epilogue(
        top_edges, logl.reshape(sh), pendant.reshape(sh),
        distal.reshape(sh), valid, dtype, packed,
        computed=computed.reshape(sh), filter_cfg=filter_cfg,
        filter_threshold=filter_threshold,
        dynamic_budget=(heur_mode == "dynamic"))


def _make_spmd_step(mesh: Mesh):
    """The jitted shard_map'd placement step bound to one mesh."""
    n_ep = mesh.shape["ep"]

    @partial(jax.jit, static_argnames=("topk", "sliding", "site_width",
                                       "use_pallas", "block_width",
                                       "phase1", "filter_cfg", "heur_mode",
                                       "packed", "has_pinv"))
    def step(consts, table, tU, tV, ls, lengths, codes, begins, spans,
             tQ, invq, threshold, filter_threshold, topk: int = 8,
             sliding: bool = True, site_width=None,
             use_pallas: bool = False, block_width=None, phase1: int = 3,
             filter_cfg=None, heur_mode: str = "dynamic",
             packed: bool = False, has_pinv: bool = False):
        body = partial(_spmd_step_body, n_ep=n_ep, topk=topk,
                       sliding=sliding, site_width=site_width,
                       use_pallas=use_pallas, block_width=block_width,
                       phase1=phase1, filter_cfg=filter_cfg,
                       heur_mode=heur_mode, packed=packed,
                       has_pinv=has_pinv)
        e_sp, q_sp, r_sp = P("ep"), P("dp"), P()
        in_specs = (r_sp, e_sp, e_sp, e_sp, e_sp, e_sp,
                    q_sp, q_sp, q_sp, q_sp, q_sp, r_sp, r_sp)
        if filter_cfg is not None or packed:
            out_specs = P(None, "dp", None)
        else:
            out_specs = tuple(P("dp") for _ in range(7))
        # check_vma=False: the Newton loop carries mix device-varying and
        # replicated values (e.g. the bool convergence init), which the
        # varying-manual-axes type check rejects; semantics are unaffected
        return jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)(
            consts, table, tU, tV, ls, lengths, codes, begins, spans,
            tQ, invq, threshold, filter_threshold)

    return step


class ShardedPlacement:
    """Places the engine's tensors on a (dp, ep) mesh and runs the fused
    placement step with sharded inputs/outputs.

    Queries ride ``dp`` (data parallel), the lookup table and BLO store
    shard over ``ep`` (edge/model parallel — the multi-chip answer to
    trees whose tensors exceed one chip's HBM). The step itself is a
    ``jax.shard_map`` program (:func:`_spmd_step_body`): every device
    runs the plain engine's single-chip kernels — including the
    blocked-Pallas Newton kernel where supported — on its local shard,
    with two small ep-axis collectives (candidate merge, pair-result
    psum) stitching the shards together."""

    def __init__(self, engine, mesh: Mesh, topk: int = 8):
        self.engine = engine
        self.mesh = mesh
        self.topk = topk
        self.num_edges = engine.num_edges

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
        if isinstance(table, tuple):
            resid, mean = table
            table = (pad_e(resid, fill=jnp.zeros((), resid.dtype)),
                     pad_e(mean, fill=jnp.asarray(-1e30, mean.dtype)))
        else:
            table = pad_e(table, fill=jnp.asarray(-1e30, table.dtype))
        self.table = jax.device_put(table, edge_sh)
        self.tU = jax.device_put(pad_e(blo.tU), edge_sh)
        self.tV = jax.device_put(pad_e(blo.tV), edge_sh)
        self.ls = jax.device_put(pad_e(blo.ls), edge_sh)
        self.lengths = jax.device_put(pad_e(blo.lengths), edge_sh)
        self.consts = jax.device_put(engine.consts, repl)
        self.qspec = NamedSharding(mesh, P("dp"))
        self._step_fn = _make_spmd_step(mesh)

    def step(self, codes, begins, spans, tQ, invq):
        put = partial(jax.device_put, device=self.qspec)
        return self._step_fn(
            self.consts, self.table, self.tU, self.tV, self.ls,
            self.lengths, put(codes), put(begins), put(spans), put(tQ),
            put(invq),
            jnp.asarray(self.engine.options.prescoring_threshold,
                        self.tU.dtype),
            jnp.asarray(0.0, self.tU.dtype),
            topk=self.topk, sliding=self.engine.options.sliding_blo,
            site_width=chunk_site_width(spans, self.tU.shape[2]))

    def fused_step(self, codes, begins, spans, tQ, invq, *, topk: int,
                   sliding: bool, site_width: int, filter_cfg,
                   filter_threshold, heur_mode: str,
                   use_pallas: bool = False, block_width=None,
                   phase1: int = 3, has_pinv: bool = False):
        """The engine's full fused dispatch (packed + device-side filter)
        over the mesh — the sharded twin of the single-device call in
        PlacementEngine._dispatch_chunk_fused, running the SAME kernels
        per device under shard_map."""
        put = partial(jax.device_put, device=self.qspec)
        return self._step_fn(
            self.consts, self.table, self.tU, self.tV, self.ls,
            self.lengths, put(codes), put(begins), put(spans), put(tQ),
            put(invq),
            jnp.asarray(self.engine.options.prescoring_threshold,
                        self.tU.dtype),
            jnp.asarray(filter_threshold, self.tU.dtype),
            topk=topk, sliding=sliding, site_width=site_width,
            use_pallas=use_pallas, block_width=block_width, phase1=phase1,
            filter_cfg=filter_cfg, heur_mode=heur_mode, packed=True,
            has_pinv=has_pinv)

    def preplace(self, codes, begins, spans) -> np.ndarray:
        """[Q, E] preplacement scores computed against the ep-sharded
        table (exact-path entry in mesh mode); pads the query batch to a
        dp multiple and drops the pad edges/rows."""
        Q = codes.shape[0]
        dp = self.mesh.shape["dp"]
        Qp = -(-Q // dp) * dp
        if Qp != Q:
            rep = lambda x: jnp.concatenate(
                [x, jnp.repeat(x[-1:], Qp - Q, axis=0)])
            codes, begins, spans = rep(codes), rep(begins), rep(spans)
        put = partial(jax.device_put, device=self.qspec)
        from epa_ng_tpu.ops.lookup import preplace_scores
        scores = preplace_scores(self.table, put(codes), put(begins),
                                 put(spans))
        return np.asarray(scores)[:Q, :self.num_edges]


def chunk_site_width(spans, num_sites: int) -> int:
    """Power-of-two window width covering every span in the chunk."""
    max_span = int(np.max(np.asarray(spans))) if len(spans) else num_sites
    w = 64
    while w < max_span:
        w *= 2
    return min(w, num_sites)
