"""Out-of-core placement: host-RAM-resident reference state, streamed to
the device per chunk.

The reference runs trees whose CLV set exceeds RAM by lazily paging CLVs
from the binary store under a per-CLV mutex (-b mode,
/root/reference/src/tree/Tree.cpp:80-117). The single-chip TPU analog: the
lookup table and BLO store live in HOST RAM (built once on the CPU
backend, whose memory ceiling is host-sized), and each chunk streams only
what it touches through HBM:

- preplacement scores accumulate edge-block by edge-block (each block's
  table slice is transferred, contracted on the MXU, and discarded), so
  peak HBM is O(block) instead of O(E);
- the thorough stage gathers per-pair SITE WINDOWS of the candidate
  edges' tensors on the host (vectorized fancy indexing — the analog of
  ``shift_partition_focus`` pointer arithmetic) and ships compact
  [pairs, RK, W] batches to the Newton kernel.

Slower than device-resident mode (every chunk re-streams the table), but
tree size is bounded by host RAM, not HBM — strictly dominating the
reference's disk-paged mode. Enabled with --memsave; multi-chip ``ep``
edge sharding (parallel.mesh) remains the fast path for big trees when
more chips are available.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from epa_ng_tpu.core.engine import PlacementEngine
from epa_ng_tpu.ops import lookup, newton

EDGE_BLOCK = 512  # edges streamed per preplacement step


@partial(jax.jit, static_argnames=("sliding", "max_smoothings"))
def _newton_windows(consts, tu, tv, tq, l, mask, olen, iv, sliding: bool,
                    max_smoothings: int):
    return newton.blo_optimize_batch(consts, tu, tv, tq, l, mask, olen, iv,
                                     sliding=sliding,
                                     max_smoothings=max_smoothings)


class OutOfCoreEngine(PlacementEngine):
    """PlacementEngine whose reference-state tensors live in host RAM."""

    def __init__(self, tree, ref_msa, model, options=None):
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            super().__init__(tree, ref_msa, model, options)
        self._offload()

    @classmethod
    def from_precomputed(cls, tree, model, options, edges, num_sites,
                         ref_intersection=None):
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            self = super().from_precomputed(
                tree, model, options, edges, num_sites, ref_intersection)
        self._offload()
        return self

    # ------------------------------------------------------------------

    def _offload(self):
        """Move the big tensors to host numpy; consts back to the default
        (accelerator) device."""
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
        self.consts = jax.device_put(self.consts)

    # the fused fast path needs device-resident tensors: always exact
    def place_encoded_async(self, ec, seq_id_offset: int = 0):
        return ("exact", (ec, seq_id_offset))

    def _use_pallas(self, width: int) -> bool:
        if self.options.pallas == "on":
            raise ValueError("pallas=on is incompatible with --memsave")
        return False

    def _query_tensors_codes(self, codes: np.ndarray):
        tQ, invq = super()._query_tensors_codes(codes)
        # host copies: the thorough stage gathers query windows host-side
        return np.asarray(tQ), np.asarray(invq)

    # -- streamed preplacement ------------------------------------------

    def preplace(self, codes, ranges) -> np.ndarray:
        E = self.num_edges
        S = self.num_sites
        Q = len(codes)
        scores = np.empty((Q, E), dtype=self._mean_np.dtype)
        codes_j = jnp.asarray(codes)
        begins = jnp.asarray(ranges[:, 0])
        spans = jnp.asarray(ranges[:, 1])
        eb = min(EDGE_BLOCK, E)
        for e0 in range(0, E, eb):
            e1 = min(e0 + eb, E)
            # pad the last block so one jit signature serves all blocks
            r = np.empty((eb,) + self._resid_np.shape[1:],
                         self._resid_np.dtype)
            m = np.empty((eb, S), self._mean_np.dtype)
            r[:e1 - e0] = self._resid_np[e0:e1]
            m[:e1 - e0] = self._mean_np[e0:e1]
            if e1 - e0 < eb:
                r[e1 - e0:] = 0
                m[e1 - e0:] = 0
            block = lookup.preplace_scores(
                (jnp.asarray(r), jnp.asarray(m)), codes_j, begins, spans)
            scores[:, e0:e1] = np.asarray(block)[:, :e1 - e0]
        return scores

    # -- thorough placement over host-gathered windows ------------------

    def _thorough(self, pair_e, pair_q, codes, ranges, qt=None):
        return host_window_thorough(self, pair_e, pair_q, codes, ranges, qt)

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
    to the XLA Newton kernel. Shared by OutOfCoreEngine (--memsave) and
    mesh mode's exact-redo fallback (PlacementEngine.attach_mesh); ``eng``
    must carry _tU_np/_tV_np/_ls_np/_lengths_np host copies."""
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
                logl, pendant, distal_rep, _, _, done = res
                out_logl[sel] = np.asarray(logl)[:n]
                out_pendant[sel] = np.asarray(pendant)[:n]
                out_distal[sel] = np.asarray(distal_rep)[:n]
                done_out[sel] = np.asarray(done)[:n]
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
