"""The placement engine: preplace -> heuristic -> thorough place -> LWR ->
filter, per streamed query chunk.

TPU-native redesign of the reference's ``simple_mpi`` loop
(src/core/place.cpp:173-251): the two OpenMP hot loops become

1. one [queries x edges] MXU contraction against the precomputed lookup
   tensor (preplacement), and
2. one vmapped Newton batch over the compacted candidate pairs (thorough
   placement),

with the ragged candidate sets bucketed into fixed-size blocks to keep XLA
shapes static.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from epa_ng_tpu.core import chunk as chunk_mod, heuristics
from epa_ng_tpu.core.chunk import EncodedChunk
from epa_ng_tpu.core.lwr import (ChunkPlacements, PQuery, compute_and_set_lwr,
                                 filter_pqueries)
from epa_ng_tpu.io.fasta import MSA
from epa_ng_tpu.models import Model
from epa_ng_tpu.models.charmaps import lookup_chars, lookup_tip_clvs
from epa_ng_tpu.ops import clv as clv_ops
from epa_ng_tpu.ops import eigen, lookup, newton
from epa_ng_tpu.tree.tree import Tree
from epa_ng_tpu.utils.options import Options

log = logging.getLogger("epa_ng_tpu")


@dataclass
class ChunkResult:
    pqueries: list  # list[PQuery]
    num_sequences: int


class PlacementEngine:
    """Holds the reference tree state (edge CLV tensors, lookup tables) and
    places query chunks against it."""

    def __init__(self, tree: Tree, ref_msa: MSA, model: Model,
                 options: Optional[Options] = None):
        self.options = options or Options()
        self.tree = tree
        self.model = model
        self.dtype = (jnp.float64 if self.options.compute_dtype == "f64"
                      else jnp.float32)

        from epa_ng_tpu.models.model import ParamValue
        if model.submodels is not None and (
                model.pinv > 0
                or model.pinv_mode == ParamValue.EMPIRICAL):
            raise ValueError(
                "p-inv is not supported together with matrix-mixture "
                "models (LG4M/LG4X)")
        masks = clv_ops.tip_state_masks(tree, ref_msa, model.num_states)
        if model.empirical_base_freqs:
            model.base_freqs = empirical_frequencies(masks, model.num_states)
            log.info("Using empirical base frequencies: %s", model.base_freqs)

        # invariant-site machinery (only materialized when pinv > 0).
        # Must run BEFORE eigen.decompose: the decomposition snapshots
        # model.pinv (the 1/(1-pinv) time scaling, ops.eigen.pmatrices).
        self._ref_intersection = None
        if model.pinv > 0 or model.pinv_mode == ParamValue.EMPIRICAL:
            inter = masks[0].copy()
            for row in masks[1:]:
                inter &= row
            if model.pinv_mode == ParamValue.EMPIRICAL and model.pinv == 0:
                # +IC outside --opt-model: the empirical proportion of
                # invariant sites — columns whose tip state masks share at
                # least one state (all-gap columns count, matching
                # pllmod_msa's convention; reference grammar:
                # src/core/raxml/Model.cpp:355-376)
                model.pinv = float((inter != 0).mean())
                log.info("Using empirical p-inv: %.6f", model.pinv)
            if model.pinv > 0:
                self._ref_intersection = inter  # [S] uint32

        self.eig = eigen.decompose(model)
        self.consts = newton.eig_consts(self.eig, self.dtype)

        tip_clvs = clv_ops.tip_clv_matrix(tree, ref_msa, model.num_states)
        self.num_sites = ref_msa.num_sites
        self.num_edges = tree.n_edges

        # --- site-pattern compression (the SITE_REPEATS analog,
        # reference: src/io/file_io.cpp:216-220): identical alignment
        # columns yield identical CLV/lookup/BLO columns, so the whole
        # reference-state build runs once per unique (all-tips) column
        # pattern; per-pattern multiplicities weight the ref-tree logl and
        # the derived full-site tensors are gather-expanded where query
        # addressing needs them. Semantically invisible; skipped in
        # --dump-binary mode (the store serializes full-site tensors).
        self._site2pat = None
        self._pat_first_idx = None
        site_weights = None
        if (self.options.pattern_compression
                and not self.options.dump_binary_mode):
            cols = np.ascontiguousarray(masks.T)
            _, first_idx, inverse, counts = np.unique(
                cols, axis=0, return_index=True, return_inverse=True,
                return_counts=True)
            if len(first_idx) < self.num_sites:
                self._site2pat = inverse.astype(np.int32)
                self._pat_first_idx = first_idx
                tip_clvs = tip_clvs[:, first_idx, :]
                site_weights = counts
                log.info("Site-pattern compression: %d unique of %d "
                         "columns", len(first_idx), self.num_sites)

        inv_logterm = self._inv_logterm_sites()
        if inv_logterm is not None and self._pat_first_idx is not None:
            inv_logterm = inv_logterm[self._pat_first_idx]

        # edge tensors + reference logl in one jitted computation
        self.edges, ref_logl = clv_ops.build_reference_state(
            tree, self.eig, tip_clvs, dtype=self.dtype,
            inv_logterm=inv_logterm, site_weights=site_weights)
        self._finish_init(ref_logl)

    @classmethod
    def from_precomputed(cls, tree: Tree, model: Model, options, edges,
                         num_sites: int, ref_intersection=None):
        """Engine from a loaded binary CLV store (io.binary.load_binary)."""
        self = cls.__new__(cls)
        self.options = options or Options()
        self.tree = tree
        self.model = model
        self.dtype = (jnp.float64 if self.options.compute_dtype == "f64"
                      else jnp.float32)
        self.eig = eigen.decompose(model)
        self.consts = newton.eig_consts(self.eig, self.dtype)
        self.edges = edges
        self.num_sites = num_sites
        self.num_edges = tree.n_edges
        self._ref_intersection = ref_intersection
        self._site2pat = None        # binary stores hold full-site tensors
        self._pat_first_idx = None
        self._finish_init()
        return self

    def attach_mesh(self, mesh):
        """Shard the reference state over a (dp, ep) ``jax.sharding.Mesh``
        for multi-chip execution (CLI: ``--mesh DPxEP``): queries ride the
        ``dp`` axis, the lookup table and BLO store shard over ``ep`` so
        trees whose tensors exceed one chip's HBM spread across the slice
        (the multi-chip answer to the reference's -b paging,
        src/tree/Tree.cpp:80-117). The fused dispatch and wide redo then
        run the shard_map'd step (parallel.mesh._spmd_step_body): every
        device executes the plain engine's single-chip kernels — on TPU
        including the blocked-Pallas Newton kernel — on its local shard;
        the rare exact-redo fallback gathers per-pair windows from HOST
        copies of the BLO store, so no full-size device replica
        survives."""
        from epa_ng_tpu.parallel.mesh import ShardedPlacement
        if self.options.memsave:
            raise ValueError("--mesh and --memsave are mutually exclusive")
        dp = mesh.shape["dp"]
        if dp & (dp - 1):
            raise ValueError("mesh dp axis must be a power of two")
        blo = self.blo
        # --- the mesh host-RAM ceiling, stated and enforced: every host
        # keeps a FULL copy of the BLO store in RAM for the rare
        # exact-redo fallback (the sharded tensors in HBM only cover the
        # fused path). ep-sharding therefore divides the HBM footprint
        # across the slice but NOT the host footprint — tree size is
        # capped at host RAM per host, not at slice HBM. (A device-
        # collective window gather from the ep shards could break this;
        # the reference's analog ceiling-breaker is its -b disk paging,
        # src/tree/Tree.cpp:80-117, our --memsave — mutually exclusive
        # with --mesh.) Checked here so the failure is a clear error at
        # attach time, not an OOM kill mid-run.
        need = int(blo.tU.nbytes + blo.tV.nbytes + blo.ls.nbytes
                   + blo.lengths.nbytes)
        avail = _host_available_bytes()
        if avail is not None and need > 0.6 * avail:
            raise RuntimeError(
                f"--mesh keeps a full host-RAM copy of the reference "
                f"state for the exact-redo fallback: need ~{need / 1e9:.1f}"
                f" GB but only {avail / 1e9:.1f} GB host RAM is available. "
                f"Tree size under --mesh is capped by host RAM per host; "
                f"for larger trees use --memsave (single device).")
        # host fallback copies for the exact-redo path (host RAM, not HBM)
        self._tU_np = np.asarray(blo.tU)
        self._tV_np = np.asarray(blo.tV)
        self._ls_np = np.asarray(blo.ls)
        self._lengths_np = np.asarray(blo.lengths)
        self._sharded = ShardedPlacement(self, mesh)
        # free the unsharded copies; everything device-side now goes
        # through self._sharded. The CLI builds the engine on the CPU
        # backend under --mesh (host RAM holds the full tensors, only
        # shards reach HBM); the small per-chunk tensors (consts, query
        # tip transforms) move to the accelerator here.
        self._lookup_table = None
        self._blo = None
        # rebuild as UNCOMMITTED default-device arrays: device_put
        # without a device leaves CPU-built arrays parked on the CPU
        # backend and fractures the jit cache with mixed-placement
        # arguments (see OutOfCoreEngine._offload)
        self.consts = jax.tree.map(
            lambda a: jnp.asarray(np.asarray(a)), self.consts)
        self._char_clvs = jnp.asarray(np.asarray(self._char_clvs))
        log.info("Attached %dx%d (dp x ep) device mesh",
                 dp, mesh.shape["ep"])

    def _finish_init(self, ref_logl: Optional[float] = None):
        self._sharded = None
        self._escalations = 0  # chunks rescued by the wide-budget ladder
        # sanity check: finite reference-tree log-likelihood
        # (reference: src/tree/Tree.cpp:49-53)
        self.ref_tree_logl = (float(self._reference_logl())
                              if ref_logl is None else ref_logl)
        if self.model.ascbias_type is not None:
            # reported evaluation logl carries the ASC correction;
            # placement scores do not (the reference never wires ASC into
            # the placement partition — raxml/Model.cpp:712-734)
            from epa_ng_tpu.ops import likelihood as lk_ops
            inv_logls = clv_ops.invariant_pattern_logls(
                self.tree, self.eig, dtype=self.dtype)
            w = (jnp.asarray(self.model.ascbias_weights, self.dtype)
                 if self.model.ascbias_weights is not None else
                 jnp.zeros(self.model.num_states, self.dtype))
            self.ref_tree_logl += float(lk_ops.asc_bias_correction(
                inv_logls, self.model.ascbias_type, w, self.num_sites))
        if not np.isfinite(self.ref_tree_logl):
            raise RuntimeError("Tree Log-Likelihood -INF!")
        log.info("Reference tree log-likelihood: %.6f", self.ref_tree_logl)

        self._lookup_table = None
        self._blo = None
        self._char_clvs = jnp.asarray(
            lookup_tip_clvs(self.model.num_states), self.dtype)
        self._lookup_cols = lookup_chars(self.model.num_states)
        self._col_masks = chunk_mod.col_state_masks(self.model.num_states)

        # HBM diet: placement runs only ever read the lookup table and the
        # eigen-transformed BLO store; the raw edge CLVs (U/V/lsU/lsV, 2x
        # the BLO store's footprint) are freed once both are derived.
        # --dump-binary keeps them: the store serializes U/V (the analog of
        # the reference's pll partition dump, src/io/Binary.cpp:211-287).
        if not self.options.dump_binary_mode:
            _ = self.lookup_table
            _ = self.blo
            self.edges = None

    # ------------------------------------------------------------------

    def _reference_logl(self) -> float:
        P = eigen.pmatrices(self.eig, self.tree.edge_lengths[:1],
                            dtype=self.dtype)
        inv = self._inv_logterm_sites()
        et = self.edges
        return _edge_logl_jit(
            et.U[0], et.lsU[0], et.V[0], et.lsV[0], P[0],
            jnp.asarray(self.eig.freqs, self.dtype),
            jnp.asarray(self.eig.weights, self.dtype),
            self.model.pinv, inv)

    def _inv_logterm_sites(self):
        """[S] log(p*pi) for ref-tree invariant sites, or None."""
        if self._ref_intersection is None:
            return None
        from epa_ng_tpu.ops import likelihood
        state = clv_ops.invariant_states(
            self._ref_intersection[None, :], self.model.num_states)
        return likelihood.make_inv_logterm(state, self.eig.freqs,
                                           self.model.pinv, self.dtype)

    def _inv_logfreq_chars(self):
        """[C, S] invariant log-term per (placed char, site); the invariant
        intersection of the extended tree includes the new query tip."""
        S = self.num_sites
        C = len(self._lookup_cols)
        if self._ref_intersection is None:
            return jnp.full((C, S), -np.inf, self.dtype)
        from epa_ng_tpu.models.charmaps import state_mask_table
        tbl = state_mask_table(self.model.num_states)
        char_masks = np.array([tbl[ord(ch)] for ch in self._lookup_cols],
                              dtype=np.uint32)
        inter = char_masks[:, None] & self._ref_intersection[None, :]
        state = clv_ops.invariant_states(
            inter.reshape(1, -1), self.model.num_states).reshape(C, S)
        out = np.full((C, S), -np.inf)
        ok = state >= 0
        out[ok] = np.log(self.model.pinv * self.eig.freqs[state[ok]])
        return jnp.asarray(out, self.dtype)

    def _inv_logfreq_queries(self, qmasks: np.ndarray):
        """[Q, S] invariant log-term per (query, site) for the BLO path."""
        Q, S = qmasks.shape
        if self._ref_intersection is None:
            return np.full((Q, S), -np.inf)
        inter = self._ref_intersection[None, :] & qmasks
        state = clv_ops.invariant_states(
            inter.reshape(1, -1), self.model.num_states).reshape(Q, S)
        out = np.full((Q, S), -np.inf)
        ok = state >= 0
        out[ok] = np.log(self.model.pinv * self.eig.freqs[state[ok]])
        return out

    @property
    def lookup_table(self):
        """[E, C, S] preplacement table (the analog of Lookup_Store, built
        in one shot) — or, with ``lookup_dtype="bf16"``, a (resid bf16,
        mean f32) split pair that halves the dominant big-tree buffer."""
        if self._lookup_table is None:
            if self.edges is None:
                raise RuntimeError(
                    "edge tensors were freed; the lookup table must be "
                    "built during engine init")
            et = self.edges
            inv_chars = self._inv_logfreq_chars()
            site_map = None
            if self._site2pat is not None:
                # compressed edge tensors: per-char invariant terms are a
                # function of the column pattern too
                inv_chars = inv_chars[:, self._pat_first_idx]
                site_map = jnp.asarray(self._site2pat)
            table = lookup.build_lookup_tables(
                self.consts, et.U, et.lsU, et.V, et.lsV, et.lengths,
                self._char_clvs, inv_chars, site_map)
            if self.options.lookup_dtype == "bf16":
                self._lookup_table = lookup.split_table(table, jnp.bfloat16)
            else:
                self._lookup_table = table
        return self._lookup_table

    @property
    def blo(self):
        """Eigen-transformed "sumtable store" for the thorough-placement
        path (newton.BloTensors), built on first use."""
        if self._blo is None:
            et = self.edges
            site_map = (None if self._site2pat is None
                        else jnp.asarray(self._site2pat))
            self._blo = newton.transform_edges(
                self.consts, et.U, et.lsU, et.V, et.lsV, et.lengths,
                site_map)
        return self._blo

    def _query_tensors(self, qmasks: np.ndarray):
        """Device tensors for a chunk: eigen-transformed query tips
        tQ [Q,K,S] and the p-inv log term invq [Q,S]."""
        nbits = self.model.num_states
        bits = (qmasks[:, None, :] >> np.arange(nbits)[None, :, None]) & 1
        qclv = jnp.asarray(bits, self.dtype)               # [Q,K,S]
        tQ = newton.transform_queries(self.consts, qclv)
        invq = jnp.asarray(self._inv_logfreq_queries(qmasks), self.dtype)
        return tQ, invq

    def _query_tensors_codes(self, codes: np.ndarray):
        """Like :meth:`_query_tensors` but from the [Q,S] lookup-code matrix:
        the tip CLVs are gathered ON DEVICE from the per-column CLV rows
        (chunk.col_state_masks exactness argument), so the host transfers
        one uint8 matrix instead of a [Q,K,S] float tensor."""
        codes_j = jnp.asarray(codes)
        tQ = _transform_codes_jit(self.consts, self._char_clvs, codes_j)
        if self._ref_intersection is not None and self.model.pinv > 0:
            qmasks = self._col_masks[codes]
            invq = jnp.asarray(self._inv_logfreq_queries(qmasks), self.dtype)
        else:
            invq = jnp.full(codes.shape, -jnp.inf, self.dtype)
        return tQ, invq

    def _use_pallas(self, width: int) -> bool:
        """Dispatch the Newton stage to the Pallas kernel? TPU backend,
        DNA (K=4) or protein (K=20) models — single-matrix or
        matrix-mixture (LG4M/LG4X), with or without +I — f32,
        sliding mode only. In mesh mode the kernel runs
        per device inside the shard_map'd step (every chip keeps the
        single-chip kernel, like the reference's per-rank SIMD kernels
        under MPI, src/core/place.cpp:64-171)."""
        opt = self.options.pallas
        if opt == "off":
            return False
        from epa_ng_tpu.ops import pallas_blo
        ok = (pallas_blo.blo_supported(self.consts, width,
                                       self.options.sliding_blo)
              and jax.default_backend() == "tpu")
        if opt == "on" and not ok:
            raise ValueError(
                "pallas=on requires a TPU backend, a DNA/AA model "
                "(single-matrix or mixture), f32, sliding BLO, and a "
                "site window within the kernel's VMEM budget")
        return ok

    # ------------------------------------------------------------------

    def calibration_rate(self, n: int = 256, seed: int = 0) -> float:
        """Measured placement throughput (queries/s) on a synthetic
        read-like chunk — the per-host "difficulty" input of the adaptive
        query sharding (parallel.schedule.proportional_shares; the
        runtime successor of the reference's stage-difficulty measurement,
        src/pipeline/Pipeline.hpp:84-125). Two passes; the second is
        timed so one-off compiles (or cache loads) don't pollute the
        rate. NOTE: with a cold persistent compile cache the warmup pass
        compiles a synthetic-chunk program (minutes on a tunneled TPU) —
        a per-host one-time tax of --adaptive-split; subsequent runs load
        from the cache in sub-seconds."""
        import time as _time
        log.info("Calibrating placement rate (first run may compile a "
                 "synthetic-chunk program; cached across runs)")
        rng = np.random.default_rng(seed)
        S = self.num_sites
        chars = lookup_chars(self.model.num_states)
        # single-state columns only (no gaps/ambiguity): peaked-enough
        # posteriors that the chunk rides the production fused path
        # instead of the saturation fallback
        from epa_ng_tpu.models.charmaps import state_mask_table
        tbl = state_mask_table(self.model.num_states)
        single = [i for i, ch in enumerate(chars)
                  if bin(int(tbl[ord(ch)])).count("1") == 1]
        codes = np.asarray(single, np.uint8)[
            rng.integers(0, len(single), size=(n, S))]
        span = max(8, S // 2)
        begins = rng.integers(0, S - span + 1, size=n).astype(np.int32)
        ranges = np.stack([begins, np.full(n, span, np.int32)], axis=1)
        ec = EncodedChunk(headers=[[f"cal{i}"] for i in range(n)],
                          codes=codes, ranges=ranges)
        self.finalize_chunk(self.place_encoded_async(ec))
        t0 = _time.perf_counter()
        self.finalize_chunk(self.place_encoded_async(ec))
        return n / (_time.perf_counter() - t0)

    def _encode_chunk(self, chunk: MSA):
        """(codes, qmasks, ranges) for an MSA chunk — all vectorized table
        lookups over one [Q,S] byte matrix (core.chunk)."""
        ec = self.encode_msa(chunk)
        qmasks = self._col_masks[ec.codes]
        return ec.codes, qmasks, ec.ranges

    def encode_msa(self, chunk: MSA) -> EncodedChunk:
        if chunk.num_sites and chunk.num_sites != self.num_sites and len(chunk):
            raise ValueError(
                "Query sequence length not same as reference alignment!")
        ec = chunk_mod.from_msa(chunk, self.model.num_states)
        return self.check_chunk(ec)

    def check_chunk(self, ec: EncodedChunk) -> EncodedChunk:
        """Validate widths/ranges and apply the premasking option."""
        if ec.codes.shape[1] != self.num_sites and len(ec):
            raise ValueError(
                "Query sequence length not same as reference alignment!")
        if not self.options.premasking:
            ec.ranges = np.zeros_like(ec.ranges)
            ec.ranges[:, 1] = self.num_sites
        elif len(ec) and (ec.ranges[:, 1] == 0).any():
            q = int(np.argmax(ec.ranges[:, 1] == 0))
            raise ValueError(
                f"Sequence with header '{ec.headers[q][0]}' does not appear "
                "to have any non-gap sites!")
        return ec

    def preplace(self, codes, ranges) -> np.ndarray:
        """[Q, E] preplacement scores."""
        if self._sharded is not None:
            return self._sharded.preplace(
                jnp.asarray(codes), jnp.asarray(ranges[:, 0]),
                jnp.asarray(ranges[:, 1]))
        scores = lookup.preplace_scores(
            self.lookup_table, jnp.asarray(codes),
            jnp.asarray(ranges[:, 0]), jnp.asarray(ranges[:, 1]))
        return np.asarray(scores)

    def place_chunk(self, chunk: MSA, seq_id_offset: int = 0) -> list:
        """Full placement of one chunk; returns filtered PQuery list.

        Fast path: for the default dynamic heuristic the whole
        preplace -> select -> Newton pipeline runs as ONE fused jitted step
        (parallel.mesh.placement_step) with a static top-k candidate
        budget; queries whose candidate set saturates the budget (the
        accumulated-LWR cut wanted more edges) fall back to the exact
        host-orchestrated path.
        """
        result = self.finalize_chunk(self.place_chunk_async(chunk,
                                                            seq_id_offset))
        from epa_ng_tpu.core.lwr import ChunkPlacements
        if isinstance(result, ChunkPlacements):
            return result.to_pqueries()
        return result

    def place_chunk_async(self, chunk: MSA, seq_id_offset: int = 0):
        return self.place_encoded_async(self.encode_msa(chunk),
                                        seq_id_offset)

    def place_encoded_async(self, ec: EncodedChunk, seq_id_offset: int = 0):
        """Dispatch the fused placement step WITHOUT syncing; returns a
        pending handle for finalize_chunk. The streaming pipeline
        dispatches chunk N+1 while chunk N's results transfer and
        assemble (device/host overlap, the TPU analog of the reference's
        __PREFETCH threads)."""
        opts = self.options
        if opts.prescoring:
            mode = heuristics.heuristic_mode(opts)
            topk = self._fused_budget(mode)
            if topk < self.num_edges:
                state = self._dispatch_chunk_fused(ec, seq_id_offset,
                                                   mode, topk)
                return ("fused", state)
        return ("exact", (ec, seq_id_offset))

    def _fused_budget(self, mode: str) -> int:
        """Static top-k candidate budget of the fused step per heuristic.
        fixed/baseball have exact static budgets (top-x% count; the 40-
        pitch cap), so the fused path covers them with zero saturation;
        dynamic uses the configured budget + wide-redo fallback."""
        opts = self.options
        if mode == "fixed":
            import math
            return min(int(math.ceil(opts.prescoring_threshold
                                     * self.num_edges)), self.num_edges)
        if mode == "baseball":
            return min(40, self.num_edges)
        topk = opts.fused_topk
        if self.model.num_states >= 20 and topk == type(opts)().fused_topk:
            # 20-state posteriors are far flatter than DNA's (the same
            # physics that rejected the pair-budget halving for AA,
            # docs/PERF.md): at the DNA default budget ~12% of AA queries
            # saturate and every chunk pays a serialized wide redo —
            # measured 2.2x slower than a 32 budget on the AA bench
            # config. Applies only when the user left the default.
            topk = max(topk, 32)
        return min(topk, self.num_edges)

    def finalize_chunk(self, handle) -> list:
        """Sync + assemble a pending chunk from place_chunk_async."""
        kind, state = handle
        if kind == "fused":
            result = self._finalize_chunk_fused(state)
            if result is not None:
                return result
            ec, seq_id_offset = state["ec"], state["seq_id_offset"]
            # >20% of queries saturated the top-k budget or lost pairs to
            # the dynamic budget halving: before surrendering to the
            # host-orchestrated exact pass, re-dispatch the WHOLE chunk
            # fused at an escalating candidate budget (4x, then 256).
            # Junk/noise reads are a normal metagenomic input class
            # (reference degrades gracefully there too,
            # src/core/heuristics.hpp:66-88); measured on 2048-taxon
            # noise chunks the dynamic cut's demand is p99 ~35 and max
            # ~91 candidates, so the 64/256 rungs de-saturate essentially
            # every real chunk and the exact pass remains only for
            # pathological posteriors flatter than random noise.
            heur_mode = state.get("heur_mode", "dynamic")
            if heur_mode == "dynamic":
                topk = state.get("topk", self.options.fused_topk)
                for k2 in (max(4 * topk, 64), 256):
                    if not (topk < k2 < self.num_edges):
                        continue
                    # HBM guard: the whole-chunk pair gather at k2 is
                    # O(Q * k2/2 * (2RK + K) * S) transient bytes; a rung
                    # that would not fit comfortably surrenders to the
                    # exact pass instead (its per-pair windows are
                    # bounded). In practice only the 256 rung on big
                    # chunks trips this, and the 64 rung has already
                    # de-saturated all but ~0.4% of noise queries.
                    pairs = len(ec) * k2 // 2
                    RK = int(self.consts.A.shape[-1]
                             * self.consts.rates.shape[0])
                    K = int(self.consts.A.shape[-1])
                    est = pairs * (2 * RK + K) * self.num_sites * (
                        4 if self.dtype == jnp.float32 else 8)
                    if est > 2 << 30:
                        break
                    # K>=20 rungs run the XLA Newton branch: tracing a
                    # fresh K=20/mixture Pallas instantiation costs
                    # minutes of pure python per (budget, window)
                    # signature — far more than the device time the
                    # kernel saves on a rescue dispatch (same argument
                    # as _thorough's small-batch XLA rule; measured:
                    # the AA/mixture bench configs spent ~200 s each
                    # tracing escalated kernel variants)
                    state2 = self._dispatch_chunk_fused(
                        ec, seq_id_offset, heur_mode, topk=k2,
                        allow_pallas=K < 20)
                    result = self._finalize_chunk_fused(state2)
                    if result is not None:
                        self._escalations += 1
                        return result
                    topk = k2
        else:
            ec, seq_id_offset = state
        return self._place_chunk_exact(ec, seq_id_offset)

    def _place_chunk_exact(self, ec: EncodedChunk, seq_id_offset) -> list:
        opts = self.options
        Q = len(ec)
        codes, ranges = ec.codes, ec.ranges
        if opts.prescoring:
            scores = self.preplace(codes, ranges)
            pair_e, pair_q = heuristics.select_work(scores, opts)
        else:
            pair_e, pair_q = heuristics.all_work(Q, self.num_edges)

        logl, pendant, distal = self._thorough(pair_e, pair_q, codes, ranges)

        # assemble per-query placement lists: pair arrays are edge-major,
        # so group by query with one vectorized argsort (a python
        # dict-append over the --no-heur Q x E pair list costs more than
        # the whole device dispatch)
        pqueries = []
        order = np.argsort(pair_q, kind="stable")
        qsorted = pair_q[order]
        uq, qstarts = np.unique(qsorted, return_index=True)
        qends = np.append(qstarts[1:], len(qsorted))
        for q, s, e in zip(uq, qstarts, qends):
            idx = order[s:e]
            pqueries.append(PQuery(
                seq_id=seq_id_offset + q,
                headers=list(ec.headers[q]),
                edge_nums=pair_e[idx].astype(np.int64),
                logls=logl[idx],
                pendant_lengths=pendant[idx],
                distal_lengths=distal[idx]))

        compute_and_set_lwr(pqueries)
        filter_pqueries(pqueries, opts)
        return pqueries

    def _dispatch_chunk_fused(self, ec: EncodedChunk, seq_id_offset,
                              heur_mode: str = "dynamic",
                              topk: int | None = None,
                              allow_pallas: bool = True):
        """Fused-step fast path, dispatch half: encode-sort-pad, enqueue
        the jitted placement step, return the pending state dict."""
        from epa_ng_tpu.parallel.mesh import chunk_site_width, placement_step
        opts = self.options
        S = self.num_sites
        # sort queries by valid-range begin: pair-blocks of the blocked
        # Pallas kernel then cover tight site windows (the TPU answer to
        # shift_partition_focus, src/core/pll/pll_util.cpp:388-418)
        perm = np.argsort(ec.ranges[:, 0], kind="stable")
        codes, ranges = ec.codes[perm], ec.ranges[perm]
        # pad the query count to a power-of-two bucket (capped at the
        # configured chunk size): Q is a traced shape in placement_step, and
        # duplicate-collapsing makes the raw count differ on every chunk —
        # without bucketing each distinct count pays a fresh ~30s compile
        Qr = len(ec)
        Qp = 64
        while Qp < Qr:
            Qp *= 2
        Qp = max(Qr, min(Qp, opts.chunk_size))
        if self._sharded is not None:
            # dp-sharded queries need a divisible batch dimension
            dp = self._sharded.mesh.shape["dp"]
            Qp = -(-Qp // dp) * dp
        if Qp > Qr:
            pad = Qp - Qr
            codes = np.concatenate([codes, np.repeat(codes[-1:], pad, 0)])
            ranges = np.concatenate([ranges, np.repeat(ranges[-1:], pad, 0)])
        tQ, invq = self._query_tensors_codes(codes)
        topk = self._fused_budget(heur_mode) if topk is None else topk
        W = chunk_site_width(ranges[:, 1], S)
        fcfg = (opts.acc_threshold, max(1, opts.filter_min),
                opts.filter_max)
        fthresh = jnp.asarray(opts.support_threshold, self.dtype)
        Wb = None
        if allow_pallas and self._use_pallas(W):
            # only the static window WIDTH is planned host-side; the
            # per-block offsets are computed on device after the
            # candidate compaction (parallel.mesh.placement_step). The
            # chunk is begin-sorted, so any contiguous dp shard of it
            # keeps the same window bound.
            from epa_ng_tpu.ops.pallas_blo import plan_blocks
            _, Wb, _ = plan_blocks(
                ranges[:, 0].astype(np.int32), ranges[:, 1].astype(np.int32),
                S, topk)
            if not self._use_pallas(Wb):
                Wb = None
        if self._sharded is not None:
            out = self._sharded.fused_step(
                jnp.asarray(codes), jnp.asarray(ranges[:, 0]),
                jnp.asarray(ranges[:, 1]), tQ, invq,
                topk=topk, sliding=opts.sliding_blo, site_width=W,
                filter_cfg=fcfg, filter_threshold=fthresh,
                heur_mode=heur_mode, use_pallas=Wb is not None,
                block_width=Wb, has_pinv=self.model.pinv > 0)
            _start_host_copy(out)
            return {
                "ec": ec, "out": out, "perm": perm, "Qr": Qr,
                "codes": codes, "ranges": ranges,
                "tQ": tQ, "invq": invq, "seq_id_offset": seq_id_offset,
                "heur_mode": heur_mode, "topk": topk,
            }
        blo = self.blo
        out = placement_step(
            self.consts, self.lookup_table, blo.tU, blo.tV, blo.ls,
            blo.lengths, jnp.asarray(codes), jnp.asarray(ranges[:, 0]),
            jnp.asarray(ranges[:, 1]), tQ, invq,
            jnp.asarray(opts.prescoring_threshold, self.dtype),
            topk=topk, sliding=opts.sliding_blo,
            site_width=W, packed=True,
            use_pallas=allow_pallas and self._use_pallas(W),
            block_width=Wb,
            filter_cfg=fcfg,
            filter_threshold=fthresh,
            heur_mode=heur_mode, has_pinv=self.model.pinv > 0)
        _start_host_copy(out)
        return {
            "ec": ec, "out": out, "perm": perm, "Qr": Qr,
            "codes": codes, "ranges": ranges,
            "tQ": tQ, "invq": invq, "seq_id_offset": seq_id_offset,
            "heur_mode": heur_mode, "topk": topk,
        }

    def _finalize_chunk_fused(self, state):
        """Fused-step fast path, sync half; returns None when >20% of
        queries saturate the top-k budget (whole chunk falls back).

        The step output arrives LWR-sorted and output-filtered (device-side
        set_manipulators analog in parallel.mesh._step_epilogue); with no
        stragglers the host work is one boolean gather into the flat
        ChunkPlacements columns."""
        opts = self.options
        ec, perm, Qr = state["ec"], state["perm"], state["Qr"]
        headers = ec.headers
        codes, ranges = state["codes"], state["ranges"]
        tQ, invq = state["tQ"], state["invq"]
        seq_id_offset = state["seq_id_offset"]
        out = np.asarray(state["out"])  # single device->host transfer
        edges = out[0].astype(np.int64)
        logl, lwr, pendant, distal = out[1], out[2], out[3], out[4]
        keep = out[5] > 0.5
        flags = np.rint(out[6][:, 0]).astype(np.int32)
        # saturated = every top-k slot selected: the dynamic cut may have
        # wanted more candidates than the static budget (ignore the
        # padded replica rows beyond the real query count)
        saturated = (flags & 1) > 0
        # a live candidate the blocked kernel did not optimize — site
        # window misfit, or dropped by the dynamic pair-budget halving on
        # a flat-posterior chunk — re-runs below; if redo would touch >20%
        # of the chunk, one exact pass beats a storm of per-query redos
        misfit = (flags & 2) > 0
        if (saturated | misfit)[:Qr].mean() > 0.2:
            return None
        redo = np.nonzero((saturated | misfit)[:Qr])[0].tolist()

        # row q of the outputs is original query perm[q]; map every array
        # back to input order and flat-gather the kept placements
        sortrow = np.empty(Qr, dtype=np.int64)
        sortrow[perm] = np.arange(Qr)
        keep_o = keep[:Qr][sortrow]
        if redo:
            # stragglers get spliced in below; blank their batch rows
            keep_o[perm[redo]] = False
        sel = keep_o.reshape(-1)
        flat = lambda a: a[:Qr][sortrow].reshape(-1)[sel]
        counts = keep_o.sum(axis=1).astype(np.int32)
        cp = ChunkPlacements(
            headers=headers, counts=counts,
            edges=flat(edges), logls=flat(logl), lwrs=flat(lwr),
            pendants=flat(pendant), distals=flat(distal),
            seq_id_offset=seq_id_offset)
        if not redo:
            return cp

        # stragglers whose accumulated-LWR cut wanted more than the fused
        # top-k budget (~0.03% of queries at the default 16): rerun the
        # SAME fused step with a 16x candidate budget — one extra device
        # dispatch instead of a host-orchestrated preplace/select/Newton
        # dance (each host sync costs a full tunnel round trip)
        sub_pqs = self._redo_wide(redo, codes, ranges, tQ, invq, perm,
                                  headers, seq_id_offset,
                                  state.get("heur_mode", "dynamic"))

        # splice the redo queries' placements into the flat columns at
        # their (currently count-0) offsets
        offs = cp.offsets
        oqs = [int(perm[q]) for q in redo]
        ins_at = np.concatenate([
            np.repeat(offs[oq], len(pq.edge_nums))
            for oq, pq in zip(oqs, sub_pqs)])
        order = np.argsort(ins_at, kind="stable")

        def splice(col, vals):
            return np.insert(col, ins_at[order],
                             np.concatenate(vals)[order])

        cp.edges = splice(cp.edges, [pq.edge_nums for pq in sub_pqs])
        cp.logls = splice(cp.logls, [pq.logls for pq in sub_pqs])
        cp.lwrs = splice(cp.lwrs, [pq.lwrs for pq in sub_pqs])
        cp.pendants = splice(cp.pendants,
                             [pq.pendant_lengths for pq in sub_pqs])
        cp.distals = splice(cp.distals,
                            [pq.distal_lengths for pq in sub_pqs])
        for oq, pq in zip(oqs, sub_pqs):
            cp.counts[oq] = len(pq.edge_nums)
        return cp

    def _redo_wide(self, redo, codes, ranges, tQ, invq, perm, headers,
                   seq_id_offset, heur_mode: str = "dynamic") -> list:
        """Place the budget-saturated / window-misfit stragglers with ONE
        wide-budget (256 candidates) fused step; returns a filtered PQuery
        per redo row, in redo order. Queries that saturate even the wide
        budget (pathologically flat posteriors) fall back to the exact
        host-orchestrated path. fixed/baseball queries only land here on
        window misfit; their budget is already exact."""
        from epa_ng_tpu.parallel.mesh import chunk_site_width, placement_step
        opts = self.options
        n_redo = len(redo)
        k2 = (min(256, self.num_edges) if heur_mode == "dynamic"
              else self._fused_budget(heur_mode))
        Qp = 8
        while Qp < n_redo:
            Qp *= 2
        if self._sharded is not None:
            Qp = max(Qp, self._sharded.mesh.shape["dp"])
        idx = np.asarray(redo + [redo[-1]] * (Qp - n_redo))
        sub_r = ranges[idx]
        W2 = chunk_site_width(sub_r[:, 1], self.num_sites)
        idx_j = jnp.asarray(idx)
        fcfg = (opts.acc_threshold, max(1, opts.filter_min),
                opts.filter_max)
        fthresh = jnp.asarray(opts.support_threshold, self.dtype)
        # the redo rows are a subset of the begin-sorted chunk, so the
        # blocked Pallas path's window assumption holds; at the 16x
        # candidate budget the XLA fallback costs ~1s of lock-step Newton
        # per chunk where the kernel needs tens of ms. K>=20 models take
        # the XLA branch here: tracing a fresh K=20/mixture kernel
        # instantiation per (budget, window) signature costs minutes of
        # pure python — the small redo batches never pay that back (same
        # rule as _thorough's small-batch dispatch and the escalation
        # ladder)
        Wb2 = None
        if self._use_pallas(W2) and self.model.num_states < 20:
            from epa_ng_tpu.ops.pallas_blo import plan_blocks
            _, Wb2, _ = plan_blocks(sub_r[:, 0].astype(np.int32),
                                    sub_r[:, 1].astype(np.int32),
                                    self.num_sites, k2)
            if not self._use_pallas(Wb2):
                Wb2 = None
        if self._sharded is not None:
            out = self._sharded.fused_step(
                jnp.asarray(codes[idx]), jnp.asarray(sub_r[:, 0]),
                jnp.asarray(sub_r[:, 1]), tQ[idx_j], invq[idx_j],
                topk=k2, sliding=opts.sliding_blo, site_width=W2,
                filter_cfg=fcfg, filter_threshold=fthresh,
                heur_mode=heur_mode, use_pallas=Wb2 is not None,
                block_width=Wb2, has_pinv=self.model.pinv > 0)
            return self._redo_wide_finish(out, redo, n_redo, k2, codes,
                                          ranges, tQ, invq, perm, headers,
                                          seq_id_offset)
        blo = self.blo
        out = placement_step(
            self.consts, self.lookup_table, blo.tU, blo.tV, blo.ls,
            blo.lengths, jnp.asarray(codes[idx]), jnp.asarray(sub_r[:, 0]),
            jnp.asarray(sub_r[:, 1]), tQ[idx_j], invq[idx_j],
            jnp.asarray(opts.prescoring_threshold, self.dtype),
            topk=k2, sliding=opts.sliding_blo, site_width=W2, packed=True,
            use_pallas=Wb2 is not None, block_width=Wb2,
            heur_mode=heur_mode,
            filter_cfg=fcfg, filter_threshold=fthresh,
            has_pinv=self.model.pinv > 0)
        return self._redo_wide_finish(out, redo, n_redo, k2, codes, ranges,
                                      tQ, invq, perm, headers,
                                      seq_id_offset)

    def _redo_wide_finish(self, out, redo, n_redo, k2, codes, ranges, tQ,
                          invq, perm, headers, seq_id_offset) -> list:
        """Shared sync half of the wide redo (single-device and mesh)."""
        out = np.asarray(out)
        edges2 = out[0].astype(np.int64)
        keep2 = out[5] > 0.5
        flags2 = np.rint(out[6][:, 0]).astype(np.int32)
        # a row re-enters the exact path when (a) its window misfit bit is
        # set — the blocked kernel skipped a live candidate, possible even
        # here because placement_step packs pairs from different-begin
        # queries into shared 128-pair blocks — or (b) it saturated a
        # budget that was still short of every edge
        exact_rows = [i for i in range(n_redo)
                      if (flags2[i] & 2)
                      or ((flags2[i] & 1) and k2 < self.num_edges)]
        exact_pqs = iter(self._redo_exact(
            [redo[i] for i in exact_rows], codes, ranges, tQ, invq, perm,
            headers, seq_id_offset)) if exact_rows else iter(())
        exact_set = set(exact_rows)
        sub_pqs = []
        for i in range(n_redo):
            if i in exact_set:
                sub_pqs.append(next(exact_pqs))
                continue
            k = keep2[i]
            oq = int(perm[redo[i]])
            sub_pqs.append(PQuery(
                seq_id=seq_id_offset + oq, headers=list(headers[oq]),
                edge_nums=edges2[i, k], logls=out[1][i, k],
                pendant_lengths=out[3][i, k], distal_lengths=out[4][i, k],
                lwrs=out[2][i, k]))
        return sub_pqs

    def _redo_exact(self, redo, codes, ranges, tQ, invq, perm, headers,
                    seq_id_offset) -> list:
        """Exact host-orchestrated placement of the given (sorted-space)
        query rows; returns filtered PQueries in redo order."""
        opts = self.options
        n_redo = len(redo)
        padded = 1
        while padded < n_redo:
            padded *= 2
        redo_pad = redo + [redo[-1]] * (padded - n_redo)
        scores = self.preplace(codes[redo_pad], ranges[redo_pad])
        sub_e, sub_q = heuristics.select_work(scores[:n_redo], opts)
        logl2, pend2, dist2 = self._thorough(
            sub_e, np.asarray(redo, np.int32)[sub_q], codes, ranges,
            qt=(tQ, invq))
        # group pairs by query with one vectorized argsort (same pattern as
        # _place_chunk_exact — no per-pair python dict appends)
        order = np.argsort(sub_q, kind="stable")
        qsorted = sub_q[order]
        uq, qstarts = np.unique(qsorted, return_index=True)
        qends = np.append(qstarts[1:], len(qsorted))
        sub_pqs = []
        for qq, s, e in zip(uq, qstarts, qends):
            sel = order[s:e]
            oq = int(perm[redo[qq]])
            sub_pqs.append(PQuery(
                seq_id=seq_id_offset + oq,
                headers=list(headers[oq]),
                edge_nums=sub_e[sel].astype(np.int64),
                logls=logl2[sel],
                pendant_lengths=pend2[sel],
                distal_lengths=dist2[sel]))
        compute_and_set_lwr(sub_pqs)
        filter_pqueries(sub_pqs, opts)
        return sub_pqs

    def _thorough(self, pair_e, pair_q, codes, ranges, qt=None, blo=None):
        """Blocked vmapped Newton BLO over the pair list, with range
        bucketing: pairs are grouped by their query's valid-range width
        (rounded up to powers of two) and each bucket computes only a
        site-window of that width — the TPU analog of the reference's
        premasking/``shift_partition_focus`` payoff on short reads.

        ``blo`` overrides the edge-tensor store (same attribute layout as
        ``self.blo``, edge ids indexing its rows): the --memsave device
        cache routes its cache-HIT pairs through this same path against a
        device-resident PREFIX of the store."""
        if self._sharded is not None:
            # mesh mode: the BLO store lives sharded across devices; the
            # rare exact-redo batches gather per-pair windows from the
            # HOST fallback copies instead (shared with --memsave)
            from epa_ng_tpu.core.memsave import host_window_thorough
            return host_window_thorough(self, pair_e, pair_q, codes,
                                        ranges, qt)
        opts = self.options
        S = self.num_sites
        P = len(pair_e)
        block = opts.blo_block

        # query tip tensors for this chunk (qt: precomputed (tQ, invq))
        tQ, invq = qt if qt is not None else self._query_tensors_codes(codes)

        begins = ranges[:, 0].astype(np.int32)
        spans = ranges[:, 1].astype(np.int32)

        # per-QUERY bucket widths (power-of-two >= span, floor 64, cap S),
        # gathered onto the pair list — a python comprehension over the
        # pair list costs O(Q*E) iterations per --no-heur chunk (see the
        # vectorization note at _place_chunk_exact)
        qwidths = np.full(len(spans), 64, dtype=np.int64)
        grow = qwidths < spans
        while grow.any():
            qwidths[grow] *= 2
            grow = qwidths < spans
        qwidths = np.minimum(qwidths, S)
        widths = qwidths[pair_q]

        blo = self.blo if blo is None else blo
        out_logl = np.zeros(P)
        out_pendant = np.zeros(P)
        out_distal = np.zeros(P)

        def run_blocked(idx: np.ndarray, cap: int) -> np.ndarray:
            """Blocked-window Pallas path: pairs sorted by their query's
            range begin, slabs of blk pairs, per-block site-window DMA.

            All slabs are DISPATCHED before any result is read back: a
            sync per slab would serialize the device behind the host's
            ~25ms tunnel round trip (127 slabs on a --no-heur chunk),
            whereas the dispatch queue keeps the chip busy back to back."""
            from epa_ng_tpu.ops.pallas_blo import plan_blocks_pairs
            done_out = np.zeros(P, dtype=bool)
            blk = 256
            while blk < min(len(idx), block):
                blk *= 2
            order = idx[np.argsort(begins[pair_q[idx]], kind="stable")]
            leftover = []
            pending = []
            for start in range(0, len(order), blk):
                sel = order[start:start + blk]
                n = len(sel)
                pad = np.concatenate([sel, np.repeat(sel[-1:], blk - n)])
                pb = begins[pair_q[pad]].astype(np.int32)
                pe = (begins + spans)[pair_q[pad]].astype(np.int32)
                offs, Wb = plan_blocks_pairs(pb, pe, S)
                if not self._use_pallas(Wb):
                    leftover.append(sel)
                    continue
                res = _blo_blocked(
                    self.consts, blo.tU, blo.tV, blo.ls, blo.lengths,
                    tQ, invq, jnp.asarray(pair_e[pad]),
                    jnp.asarray(pair_q[pad]),
                    jnp.asarray(pb), jnp.asarray(spans[pair_q[pad]]),
                    jnp.asarray(offs), Wb, cap,
                    has_pinv=self.model.pinv > 0)
                # async host copies: without these every slab's np.asarray
                # below pays a full host<->device round trip SERIALLY —
                # measured 0.03s x 4 arrays x 134 slabs = 17s of pure
                # latency on a --no-heur chunk through the TPU tunnel,
                # 20x the actual device time
                for a in res:
                    _start_host_copy(a)
                pending.append((sel, n, res))
            for sel, n, (logl, pendant, distal_rep, done) in pending:
                out_logl[sel] = np.asarray(logl)[:n]
                out_pendant[sel] = np.asarray(pendant)[:n]
                out_distal[sel] = np.asarray(distal_rep)[:n]
                done_out[sel] = np.asarray(done)[:n]
            if leftover:
                rest = np.concatenate(leftover)
                done_out[rest] = run_bucketed(rest, cap)[rest]
            return done_out

        def run_bucketed(idx: np.ndarray, cap: int,
                         allow_pallas: bool = True) -> np.ndarray:
            """Width-bucketed per-pair windowed path (XLA Newton, or the
            per-pair Pallas kernel when supported)."""
            done_out = np.zeros(P, dtype=bool)
            # adapt the block to the subset so small redo batches don't pad
            # to the full block (shapes stay cached: power-of-two sizes)
            blk = 256
            while blk < min(len(idx), block):
                blk *= 2
            order = idx[np.argsort(widths[idx], kind="stable")]
            pending = []
            for W in np.unique(widths[idx]):
                widx = order[widths[order] == W]
                use_pallas = (allow_pallas and opts.sliding_blo
                              and self._use_pallas(int(W)))
                for start in range(0, len(widx), blk):
                    sel = widx[start:start + blk]
                    n = len(sel)
                    pad = np.concatenate(
                        [sel, np.repeat(sel[-1:], blk - n)])
                    e_j = jnp.asarray(pair_e[pad])
                    q_j = jnp.asarray(pair_q[pad])
                    # clamp window starts so begin + W <= S
                    b_np = np.minimum(begins[pair_q[pad]], S - W)
                    res = _blo_windowed(
                        self.consts, blo.tU, blo.tV, blo.ls,
                        blo.lengths, tQ, invq, e_j, q_j,
                        jnp.asarray(b_np),
                        jnp.asarray(begins[pair_q[pad]] - b_np),
                        jnp.asarray(spans[pair_q[pad]]),
                        int(W), opts.sliding_blo, cap, use_pallas,
                        has_pinv=self.model.pinv > 0)
                    for a in res:
                        _start_host_copy(a)
                    pending.append((sel, n, res))
            # dispatch-all-then-read: see run_blocked
            for sel, n, (logl, pendant, distal_rep, done) in pending:
                out_logl[sel] = np.asarray(logl)[:n]
                out_pendant[sel] = np.asarray(pendant)[:n]
                out_distal[sel] = np.asarray(distal_rep)[:n]
                done_out[sel] = np.asarray(done)[:n]
            return done_out

        def run(idx: np.ndarray, cap: int) -> np.ndarray:
            """Optimize the given pair subset with a smoothing cap; fills
            outputs, returns the per-pair converged flags.

            Small batches (the saturation-redo path) go through the XLA
            windowed kernel: tracing the unrolled Pallas kernels costs ~2s
            of pure python per width variant — far more than the device
            time saved on a few hundred pairs."""
            small = len(idx) < 4096
            if (not small) and opts.sliding_blo and self._use_pallas(128):
                return run_blocked(idx, cap)
            return run_bucketed(idx, cap, allow_pallas=not small)

        # two-phase convergence compaction: most pairs converge (or roll
        # back) within a couple of smoothings; run everything with a small
        # cap first, then only the unconverged tail with the full budget,
        # so the lock-step while_loop is not dragged to 32 iterations by a
        # few stragglers.
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


def _start_host_copy(out):
    """Begin the device->host result transfer WITHOUT blocking: the fused
    step's packed output starts riding the (20 MB/s, in this environment)
    host link as soon as its chunk finishes on device, overlapped with the
    next chunks' compute, so finalize_chunk's np.asarray finds the bytes
    already landed (the async half of the reference's jplace_writer
    future, src/io/jplace_writer.hpp:58-69)."""
    try:
        out.copy_to_host_async()
    except AttributeError:
        pass


def _host_available_bytes():
    """Available host RAM (MemAvailable), or None when undeterminable."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    return int(line.split()[1]) * 1024
    except OSError:
        pass
    return None


@jax.jit
def _transform_codes_jit(consts, char_clvs, codes):
    """tQ [Q,K|RK,S] from the lookup-code matrix: gather per-column tip-CLV
    rows on device, then eigen-transform (newton.transform_queries)."""
    qclv = jnp.transpose(char_clvs[codes], (0, 2, 1))  # [Q,K,S]
    return newton.transform_queries(consts, qclv)


@partial(jax.jit, static_argnames=("pinv",))
def _edge_logl_jit(U, lsU, V, lsV, P, freqs, weights, pinv, inv_logterm):
    from epa_ng_tpu.ops import likelihood
    return likelihood.edge_loglikelihood(U, lsU, V, lsV, P, freqs, weights,
                                         pinv=pinv, inv_logterm=inv_logterm)


@partial(jax.jit, static_argnames=("width", "max_smoothings", "has_pinv"))
def _blo_blocked(consts, tU, tV, ls, lengths, tQ, invq, e_ids, q_ids,
                 begins, spans, offs, width: int, max_smoothings: int,
                 has_pinv: bool = False):
    """Blocked-window Pallas dispatch for an explicit pair list: fast
    full-row gathers; each 128-pair block DMAs its own site window (see
    ops.pallas_blo.blo_optimize_batch_pallas_blocked). +I models feed the
    per-(pair, site) linear invariant term via ``has_pinv``."""
    from epa_ng_tpu.ops.pallas_blo import PB, blo_optimize_batch_pallas_blocked
    S = tU.shape[2]
    dtype = tU.dtype
    tUg, tVg, tQg = tU[e_ids], tV[e_ids], tQ[q_ids]
    site = jnp.arange(S)
    ends = begins + spans
    fullmask = ((site[None, :] >= begins[:, None])
                & (site[None, :] < ends[:, None])).astype(dtype)
    ls_sum = jnp.sum(fullmask * ls[e_ids], axis=1)
    local = begins - jnp.repeat(offs, PB)
    wsite = jnp.arange(width)
    bmask = ((wsite[None, :] >= local[:, None])
             & (wsite[None, :] < (local + spans)[:, None])).astype(dtype)
    pv = jnp.exp(invq[q_ids] - ls[e_ids]) if has_pinv else None
    logl, pendant, distal_rep, _, _, done = blo_optimize_batch_pallas_blocked(
        consts, tUg, tVg, tQg, bmask, lengths[e_ids], offs, ls_sum,
        block_width=width, max_smoothings=max_smoothings, pinv_lin=pv)
    return logl, pendant, distal_rep, done


@partial(jax.jit, static_argnames=("width", "sliding", "max_smoothings",
                                   "use_pallas", "has_pinv"))
def _blo_windowed(consts, tU, tV, ls, lengths, tQ, invq,
                  e_ids, q_ids, win_begin, local_begin, spans,
                  width: int, sliding: bool,
                  max_smoothings: int = newton.SMOOTHINGS,
                  use_pallas: bool = False, has_pinv: bool = False):
    """Gather per-pair site windows [width] out of the full-S tensors and
    run the Newton batch on the compact windows."""
    RK = tU.shape[1]
    K = tQ.shape[1]
    zero = jnp.zeros((), jnp.int32)

    def slice_pair(e, q, b):
        b = b.astype(jnp.int32)
        tu = jax.lax.dynamic_slice(tU[e], (zero, b), (RK, width))
        tv = jax.lax.dynamic_slice(tV[e], (zero, b), (RK, width))
        tq = jax.lax.dynamic_slice(tQ[q], (zero, b), (K, width))
        l = jax.lax.dynamic_slice(ls[e], (b,), (width,))
        iv = jax.lax.dynamic_slice(invq[q], (b,), (width,))
        return tu, tv, tq, l, iv

    tu, tv, tq, l, iv = jax.vmap(slice_pair)(e_ids, q_ids, win_begin)
    site = jnp.arange(width)
    mask = ((site[None, :] >= local_begin[:, None])
            & (site[None, :] < (local_begin + spans)[:, None]))
    mask = mask.astype(tU.dtype)
    if use_pallas:
        from epa_ng_tpu.ops.pallas_blo import blo_optimize_batch_pallas
        logl, pendant, distal_rep, _, _, done = blo_optimize_batch_pallas(
            consts, tu, tv, tq, l, mask, lengths[e_ids], iv,
            max_smoothings=max_smoothings, has_pinv=has_pinv)
    else:
        logl, pendant, distal_rep, _, _, done = newton.blo_optimize_batch(
            consts, tu, tv, tq, l, mask, lengths[e_ids], iv, sliding=sliding,
            max_smoothings=max_smoothings)
    return logl, pendant, distal_rep, done


def empirical_frequencies(tip_masks: np.ndarray, num_states: int) -> np.ndarray:
    """Empirical base frequencies from the reference alignment, counting
    ambiguous characters fractionally across their states (the
    pllmod_msa_empirical_frequencies convention)."""
    full = (1 << num_states) - 1
    nongap = tip_masks[tip_masks != full]
    popc = np.zeros_like(nongap)
    tmp = nongap.copy()
    while tmp.any():
        popc += tmp & 1
        tmp >>= 1
    inv = 1.0 / popc  # each char contributes 1/|states| per member state
    counts = np.array([
        (((nongap >> s) & 1) * inv).sum() for s in range(num_states)])
    return counts / counts.sum()
