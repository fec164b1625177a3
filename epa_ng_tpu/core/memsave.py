"""Out-of-core placement: host-RAM-resident reference state, a
budget-bounded device cache, and streamed placement for the remainder.

The reference runs trees whose CLV set exceeds RAM by lazily paging CLVs
from the binary store into a bounded memory pool under a per-CLV mutex
(-b mode, /root/reference/src/tree/Tree.cpp:80-117). The single-chip TPU
analog has the same two tiers:

- the lookup table and BLO store are built on the CPU backend (host-sized
  memory ceiling) and live in HOST RAM;
- a PREFIX of both stores, sized by ``--memsave-budget`` (default: a
  fraction of device memory), stays device-resident — the analog of the
  reference's memory pool. Cache-hit work runs the normal device kernels;
- the remainder streams per chunk with bounded-depth pipelining (uploads
  overlap device compute and result downloads ride
  ``copy_to_host_async``), so peak HBM stays O(budget + blocks in
  flight):

  * preplacement scores accumulate edge-block by edge-block (cached
    blocks upload once, streamed blocks are transferred, contracted on
    the MXU, and discarded);
  * thorough-placement pairs split by their edge id: pairs on cached
    edges go through ``PlacementEngine._thorough`` against the cached
    prefix (device-side window gathers); the rest gather per-pair SITE
    WINDOWS of the host tensors (vectorized fancy indexing — the analog
    of ``shift_partition_focus``) and ship compact [pairs, RK, W]
    batches to the Newton kernel.

With a budget that covers the whole store the engine flips to the
parent's FUSED device-resident path (one jitted placement step per
chunk, Pallas kernel included) — device-resident speed, not an
approximation of it; with budget 0 it is pure streaming, bounded only
by host RAM — strictly dominating the reference's disk-paged mode at
both ends. Budget unit: decimal GB (1 GB = 1e9 bytes). Enabled with
--memsave; multi-chip ``ep`` edge sharding (parallel.mesh) remains the
fast path for big trees when more chips are available.
"""

from __future__ import annotations

from collections import deque
from functools import partial
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

from epa_ng_tpu.core.engine import PlacementEngine, _start_host_copy
from epa_ng_tpu.ops import lookup, newton

EDGE_BLOCK = 512  # edges streamed per preplacement step
PRE_PIPELINE_DEPTH = 2   # streamed preplacement blocks in flight
SLAB_PIPELINE_DEPTH = 4  # thorough window slabs in flight
AUTO_BUDGET_FRACTION = 0.35  # of device memory, when discoverable
AUTO_BUDGET_FALLBACK = 4 << 30


def _check_pallas_option(options):
    """Fail a doomed --memsave + pallas=on combination BEFORE the
    expensive CPU-backend reference-state build: with an explicit budget
    of 0 (pure streaming) the fused device path can never run. Budgets
    that might cover the whole store are re-checked after the build
    (_init_cache), where the store size is known."""
    if (options is not None and options.pallas == "on"
            and getattr(options, "memsave_budget_gb", None) is not None
            and options.memsave_budget_gb <= 0):
        raise ValueError(
            "pallas=on is incompatible with --memsave-budget 0 (pure "
            "streaming); the Pallas kernel needs the fused "
            "device-resident path")


def _device_memory_bytes():
    try:
        st = jax.devices()[0].memory_stats()
        if st and st.get("bytes_limit"):
            return int(st["bytes_limit"])
    except Exception:
        pass
    return None


@partial(jax.jit, static_argnames=("sliding", "max_smoothings"))
def _newton_windows(consts, tu, tv, tq, l, mask, olen, iv, sliding: bool,
                    max_smoothings: int):
    return newton.blo_optimize_batch(consts, tu, tv, tq, l, mask, olen, iv,
                                     sliding=sliding,
                                     max_smoothings=max_smoothings)


class OutOfCoreEngine(PlacementEngine):
    """PlacementEngine whose reference-state tensors live in host RAM,
    fronted by a budget-bounded device cache."""

    def __init__(self, tree, ref_msa, model, options=None):
        _check_pallas_option(options)
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            super().__init__(tree, ref_msa, model, options)
        self._offload()

    @classmethod
    def from_precomputed(cls, tree, model, options, edges, num_sites,
                         ref_intersection=None):
        _check_pallas_option(options)
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            self = super().from_precomputed(
                tree, model, options, edges, num_sites, ref_intersection)
        self._offload()
        return self

    # ------------------------------------------------------------------

    def _offload(self):
        """Move the big tensors to host numpy, fill the device cache up
        to the budget; consts back to the default (accelerator) device."""
        table = self._lookup_table
        if isinstance(table, tuple):
            self._resid_np = np.asarray(table[0])
            self._mean_np = np.asarray(table[1])
        else:
            resid, mean = lookup.split_table(table)
            self._resid_np = np.asarray(resid)
            self._mean_np = np.asarray(mean)
        self._lookup_table = None  # nothing big stays on device
        blo = self._blo
        self._tU_np = np.asarray(blo.tU)
        self._tV_np = np.asarray(blo.tV)
        self._ls_np = np.asarray(blo.ls)
        self._lengths_np = np.asarray(blo.lengths)
        self._blo = None
        # move the small per-run tensors to the ACCELERATOR as plain
        # UNCOMMITTED arrays (exactly how the device-resident engine
        # holds them, so fused programs share its jit cache entries):
        # device_put without a device leaves them parked on the CPU
        # backend they were built on, and mixed-placement jit arguments
        # fracture the compile cache (measured: every fused memsave
        # chunk recompiled, 80 s for 4 chunks vs ~0.5 s warm)
        self.consts = jax.tree.map(
            lambda a: jnp.asarray(np.asarray(a)), self.consts)
        self._char_clvs = jnp.asarray(np.asarray(self._char_clvs))
        self._init_cache()

    def _init_cache(self):
        """Size the device cache (the reference's -b memory-pool analog):
        the budget is split between the preplacement table and the BLO
        store proportionally to their total sizes, each caching a prefix
        of whole blocks / edges.

        Budget unit: DECIMAL gigabytes (GB = 1e9 bytes), matching the
        CLI help text; the auto fallback is the only power-of-two
        constant and it is converted once here. When the budget covers
        BOTH stores entirely, the engine flips to the fused
        device-resident path (the parent class's fast path, incl. the
        Pallas kernel): the reference's -b paging costs nothing once the
        pool is warm (src/tree/Tree.cpp:80-117), and so does --memsave
        with a covering cache."""
        # drop any previous tier's device arrays BEFORE allocating the
        # new ones, so re-sizing never holds ~2x the budget in HBM
        self._blo_cache = None
        self._pre_cache: dict[int, tuple] = {}
        self._lookup_table = None
        self._blo = None
        gb = getattr(self.options, "memsave_budget_gb", None)
        if gb is None:
            dev = _device_memory_bytes()
            budget = (int(dev * AUTO_BUDGET_FRACTION) if dev
                      else AUTO_BUDGET_FALLBACK)
        else:
            budget = max(0, int(gb * 1e9))  # negative degrades to 0
        self._budget_bytes = budget
        E = self.num_edges
        eb = min(EDGE_BLOCK, E)
        self._pre_block = eb
        n_blocks = -(-E // eb)
        pre_total = self._resid_np.nbytes + self._mean_np.nbytes
        blo_total = (self._tU_np.nbytes + self._tV_np.nbytes
                     + self._ls_np.nbytes + self._lengths_np.nbytes)
        total = pre_total + blo_total
        self._full_cover = budget >= total
        if self._full_cover:
            # covering budget: everything device-resident, fused path on
            self._pre_cache_nblocks = n_blocks
            self._blo_cache_edges = E
            self._lookup_table = (jnp.asarray(self._resid_np),
                                  jnp.asarray(self._mean_np))
            self._blo = SimpleNamespace(
                tU=jnp.asarray(self._tU_np), tV=jnp.asarray(self._tV_np),
                ls=jnp.asarray(self._ls_np),
                lengths=jnp.asarray(self._lengths_np))
            self._blo_cache = self._blo
            return
        if self.options.pallas == "on":
            raise ValueError(
                "pallas=on needs the fused device-resident path; under "
                "--memsave that requires a budget covering the whole "
                f"reference state ({total / 1e9:.2f} GB)")
        pre_budget = budget * pre_total // max(1, total)
        blo_budget = budget - pre_budget
        # size by the PADDED per-block upload (the last block is padded
        # to the common block shape), so residency never exceeds budget
        pre_block_bytes = (self._resid_np[:1].nbytes
                           + self._mean_np[:1].nbytes) * eb
        self._pre_cache_nblocks = min(
            n_blocks, int(pre_budget // max(1, pre_block_bytes)))
        # the blo cache always uploads the FULL lengths array (tiny, [E]);
        # charge it before dividing the rest per edge so the cache's true
        # residency (device_cached_bytes) stays under the budget
        len_bytes = self._lengths_np.nbytes
        per_edge = -(-(self._tU_np.nbytes + self._tV_np.nbytes
                       + self._ls_np.nbytes) // E)
        C = min(E, max(0, int((blo_budget - len_bytes)
                              // max(1, per_edge))))
        self._blo_cache_edges = C
        if C > 0:
            self._blo_cache = SimpleNamespace(
                tU=jnp.asarray(self._tU_np[:C]),
                tV=jnp.asarray(self._tV_np[:C]),
                ls=jnp.asarray(self._ls_np[:C]),
                lengths=jnp.asarray(self._lengths_np))

    def device_cached_bytes(self) -> int:
        n = 0
        if self._blo_cache is not None:
            n += (self._blo_cache.tU.nbytes + self._blo_cache.tV.nbytes
                  + self._blo_cache.ls.nbytes
                  + self._blo_cache.lengths.nbytes)
        if self._full_cover and self._lookup_table is not None:
            r, m = self._lookup_table
            n += r.nbytes + m.nbytes
        for r, m in self._pre_cache.values():
            n += r.nbytes + m.nbytes
        return n

    # the fused fast path needs device-resident tensors: with a covering
    # cache it runs unchanged (parent dispatch, Pallas included);
    # otherwise the chunk takes the streamed exact path
    def place_encoded_async(self, ec, seq_id_offset: int = 0):
        if self._full_cover:
            return PlacementEngine.place_encoded_async(self, ec,
                                                       seq_id_offset)
        return ("exact", (ec, seq_id_offset))

    def _use_pallas(self, width: int) -> bool:
        if self._full_cover:
            return PlacementEngine._use_pallas(self, width)
        # options_from_args / _init_cache reject pallas=="on" up front
        return False

    def _query_tensors_codes(self, codes: np.ndarray):
        tQ, invq = super()._query_tensors_codes(codes)
        if self._full_cover:
            return tQ, invq  # device path; no host gathers happen
        # host copies: the thorough stage gathers query windows host-side
        return np.asarray(tQ), np.asarray(invq)

    # -- streamed preplacement ------------------------------------------

    def preplace(self, codes, ranges) -> np.ndarray:
        if self._full_cover:  # device-resident table: the parent's path
            return PlacementEngine.preplace(self, codes, ranges)
        E = self.num_edges
        S = self.num_sites
        Q = len(codes)
        scores = np.empty((Q, E), dtype=self._mean_np.dtype)
        codes_j = jnp.asarray(codes)
        begins = jnp.asarray(ranges[:, 0])
        spans = jnp.asarray(ranges[:, 1])
        eb = self._pre_block

        def block_tensors(e0, e1):
            # pad the last block so one jit signature serves all blocks
            r = np.empty((eb,) + self._resid_np.shape[1:],
                         self._resid_np.dtype)
            m = np.empty((eb, S), self._mean_np.dtype)
            r[:e1 - e0] = self._resid_np[e0:e1]
            m[:e1 - e0] = self._mean_np[e0:e1]
            if e1 - e0 < eb:
                r[e1 - e0:] = 0
                m[e1 - e0:] = 0
            return jnp.asarray(r), jnp.asarray(m)

        # bounded-depth pipeline: block b+1's upload overlaps block b's
        # contraction and result download (draining the oldest entry
        # bounds in-flight HBM at O(depth * block))
        pending = deque()

        def drain_one():
            e0, e1, block = pending.popleft()
            scores[:, e0:e1] = np.asarray(block)[:, :e1 - e0]

        for bi, e0 in enumerate(range(0, E, eb)):
            e1 = min(e0 + eb, E)
            if bi < self._pre_cache_nblocks:
                pair = self._pre_cache.get(bi)
                if pair is None:  # first touch: upload once, keep
                    pair = block_tensors(e0, e1)
                    self._pre_cache[bi] = pair
            else:
                pair = block_tensors(e0, e1)
            block = lookup.preplace_scores(pair, codes_j, begins, spans)
            _start_host_copy(block)
            pending.append((e0, e1, block))
            if len(pending) > PRE_PIPELINE_DEPTH:
                drain_one()
        while pending:
            drain_one()
        return scores

    # -- thorough placement: cached-prefix hits + host-gathered misses --

    def _thorough(self, pair_e, pair_q, codes, ranges, qt=None):
        qt = qt if qt is not None else self._query_tensors_codes(codes)
        C = self._blo_cache_edges
        if C <= 0 or self._blo_cache is None:
            return host_window_thorough(self, pair_e, pair_q, codes,
                                        ranges, qt)
        hit = pair_e < C
        if hit.all():
            return PlacementEngine._thorough(
                self, pair_e, pair_q, codes, ranges,
                qt=(jnp.asarray(qt[0]), jnp.asarray(qt[1])),
                blo=self._blo_cache)
        if not hit.any():
            return host_window_thorough(self, pair_e, pair_q, codes,
                                        ranges, qt)
        P = len(pair_e)
        logl = np.zeros(P)
        pend = np.zeros(P)
        dist = np.zeros(P)
        hi = np.nonzero(hit)[0]
        mi = np.nonzero(~hit)[0]
        lh, ph, dh = PlacementEngine._thorough(
            self, pair_e[hi], pair_q[hi], codes, ranges,
            qt=(jnp.asarray(qt[0]), jnp.asarray(qt[1])),
            blo=self._blo_cache)
        lm, pm, dm = host_window_thorough(self, pair_e[mi], pair_q[mi],
                                          codes, ranges, qt)
        logl[hi], pend[hi], dist[hi] = lh, ph, dh
        logl[mi], pend[mi], dist[mi] = lm, pm, dm
        return logl, pend, dist

    def host_resident_bytes(self) -> int:
        return (self._resid_np.nbytes + self._mean_np.nbytes
                + self._tU_np.nbytes + self._tV_np.nbytes
                + self._ls_np.nbytes + self._lengths_np.nbytes)


def _gather_windows(eng, pair_e, pair_q, win_begin, W, tQ, invq):
    """Host-side per-pair site-window gathers of the BLO tensors
    (``eng`` carries _tU_np/_tV_np/_ls_np host copies)."""
    RK = eng._tU_np.shape[1]
    K = tQ.shape[1]
    cols = win_begin[:, None] + np.arange(W)[None, :]       # [P, W]
    e_ix = pair_e[:, None, None]
    tu = eng._tU_np[e_ix, np.arange(RK)[None, :, None], cols[:, None, :]]
    tv = eng._tV_np[e_ix, np.arange(RK)[None, :, None], cols[:, None, :]]
    q_ix = pair_q[:, None, None]
    tq = tQ[q_ix, np.arange(K)[None, :, None], cols[:, None, :]]
    l = eng._ls_np[pair_e[:, None], cols]
    iv = invq[pair_q[:, None], cols]
    return tu, tv, tq, l, iv


def host_window_thorough(eng, pair_e, pair_q, codes, ranges, qt=None):
    """Thorough placement with HOST-resident BLO tensors: per-pair site
    windows are gathered on the host (vectorized fancy indexing — the
    analog of ``shift_partition_focus``) and shipped as compact batches
    to the XLA Newton kernel, pipelined at bounded depth so uploads,
    device compute and result downloads overlap. Shared by
    OutOfCoreEngine (--memsave cache misses) and mesh mode's exact-redo
    fallback (PlacementEngine.attach_mesh); ``eng`` must carry
    _tU_np/_tV_np/_ls_np/_lengths_np host copies."""
    opts = eng.options
    S = eng.num_sites
    P = len(pair_e)
    tQ, invq = qt if qt is not None else eng._query_tensors_codes(codes)
    tQ = np.asarray(tQ)
    invq = np.asarray(invq)

    begins = ranges[:, 0].astype(np.int32)
    spans = ranges[:, 1].astype(np.int32)

    def bucket_width(span: int) -> int:
        w = 64
        while w < span:
            w *= 2
        return min(w, S)

    widths = np.asarray([bucket_width(int(spans[q])) for q in pair_q])
    out_logl = np.zeros(P)
    out_pendant = np.zeros(P)
    out_distal = np.zeros(P)

    def run(idx: np.ndarray, cap: int) -> np.ndarray:
        done_out = np.zeros(P, dtype=bool)
        blk = 256
        while blk < min(len(idx), opts.blo_block):
            blk *= 2
        order = idx[np.argsort(widths[idx], kind="stable")]
        pending = deque()

        def drain_one():
            sel, n, res = pending.popleft()
            logl, pendant, distal_rep, _, _, done = res
            out_logl[sel] = np.asarray(logl)[:n]
            out_pendant[sel] = np.asarray(pendant)[:n]
            out_distal[sel] = np.asarray(distal_rep)[:n]
            done_out[sel] = np.asarray(done)[:n]

        for W in np.unique(widths[idx]):
            widx = order[widths[order] == W]
            for start in range(0, len(widx), blk):
                sel = widx[start:start + blk]
                n = len(sel)
                pad = np.concatenate([sel, np.repeat(sel[-1:], blk - n)])
                pe = pair_e[pad]
                pq = pair_q[pad]
                wb = np.minimum(begins[pq], S - W).astype(np.int32)
                tu, tv, tq, l, iv = _gather_windows(
                    eng, pe, pq, wb, int(W), tQ, invq)
                local = begins[pq] - wb
                site = np.arange(W)[None, :]
                mask = ((site >= local[:, None])
                        & (site < (local + spans[pq])[:, None]))
                res = _newton_windows(
                    eng.consts, jnp.asarray(tu), jnp.asarray(tv),
                    jnp.asarray(tq), jnp.asarray(l),
                    jnp.asarray(mask.astype(tu.dtype)),
                    jnp.asarray(eng._lengths_np[pe]), jnp.asarray(iv),
                    opts.sliding_blo, cap)
                for a in res:
                    _start_host_copy(a)
                pending.append((sel, n, res))
                if len(pending) > SLAB_PIPELINE_DEPTH:
                    drain_one()
        while pending:
            drain_one()
        return done_out

    all_idx = np.arange(P)
    phase1 = min(opts.blo_phase1_smoothings, opts.max_blo_iters)
    done = run(all_idx, phase1)
    redo = all_idx[~done]
    if len(redo):
        run(redo, opts.max_blo_iters)
    if not np.isfinite(out_logl).all():
        bad = int(np.nonzero(~np.isfinite(out_logl))[0][0])
        raise RuntimeError(
            f"-INF logl at branch {pair_e[bad]} for query {pair_q[bad]}")
    return out_logl, out_pendant, out_distal
