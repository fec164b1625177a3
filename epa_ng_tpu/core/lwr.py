"""Like-weight-ratio computation and output filtering.

Host-side (numpy) post-processing of the thorough-placement results; per
query the placement count is tiny, so this mirrors the reference's
set_manipulators (src/set_manipulators.cpp:43-204) directly:

- LWR = max-shifted softmax over each query's placements,
- filtering either by min-LWR threshold or accumulated-LWR threshold, with
  filter_min/filter_max clamps.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from epa_ng_tpu.utils.options import Options


@dataclass
class PQuery:
    """Placements of one query (analog of sample/PQuery.hpp)."""
    seq_id: int
    headers: list[str]
    edge_nums: np.ndarray       # [P]
    logls: np.ndarray           # [P]
    pendant_lengths: np.ndarray  # [P]
    distal_lengths: np.ndarray  # [P]
    lwrs: np.ndarray = None     # [P]


@dataclass
class ChunkPlacements:
    """One chunk's filtered placements in flat column form (the analog of
    Sample<Placement>, src/sample/Sample.hpp, but structure-of-arrays):
    query q owns rows [offsets[q], offsets[q] + counts[q]) of the flat
    arrays, already sorted by LWR descending. This is what the fused
    device step hands to the jplace writer — no per-query objects on the
    hot path."""
    headers: list               # list[list[str]], one per query
    counts: np.ndarray          # [Q] int32
    edges: np.ndarray           # [sum(counts)] int64
    logls: np.ndarray           # [sum(counts)]
    lwrs: np.ndarray            # [sum(counts)]
    pendants: np.ndarray        # [sum(counts)]
    distals: np.ndarray         # [sum(counts)]
    seq_id_offset: int = 0

    def __len__(self) -> int:
        return len(self.headers)

    @property
    def offsets(self) -> np.ndarray:
        return np.concatenate([[0], np.cumsum(self.counts)])

    def to_pqueries(self) -> list[PQuery]:
        offs = self.offsets
        return [
            PQuery(seq_id=self.seq_id_offset + q, headers=list(h),
                   edge_nums=self.edges[offs[q]:offs[q + 1]],
                   logls=self.logls[offs[q]:offs[q + 1]],
                   pendant_lengths=self.pendants[offs[q]:offs[q + 1]],
                   distal_lengths=self.distals[offs[q]:offs[q + 1]],
                   lwrs=self.lwrs[offs[q]:offs[q + 1]])
            for q, h in enumerate(self.headers)]

    @classmethod
    def from_pqueries(cls, pqueries: list[PQuery],
                      seq_id_offset: int = 0) -> "ChunkPlacements":
        cat = (lambda arrs, dt: np.concatenate(arrs) if arrs
               else np.zeros(0, dt))
        return cls(
            headers=[list(pq.headers) for pq in pqueries],
            counts=np.array([len(pq.edge_nums) for pq in pqueries],
                            dtype=np.int32),
            edges=cat([pq.edge_nums for pq in pqueries], np.int64),
            logls=cat([pq.logls for pq in pqueries], np.float64),
            lwrs=cat([pq.lwrs for pq in pqueries], np.float64),
            pendants=cat([pq.pendant_lengths for pq in pqueries], np.float64),
            distals=cat([pq.distal_lengths for pq in pqueries], np.float64),
            seq_id_offset=seq_id_offset)


def compute_and_set_lwr(pqueries: list[PQuery]):
    """Max-shifted softmax per query (set_manipulators.cpp:43-69)."""
    for pq in pqueries:
        m = pq.logls.max()
        ex = np.exp(pq.logls - m)
        pq.lwrs = ex / ex.sum()


def _apply_order(pq: PQuery, order: np.ndarray):
    pq.edge_nums = pq.edge_nums[order]
    pq.logls = pq.logls[order]
    pq.pendant_lengths = pq.pendant_lengths[order]
    pq.distal_lengths = pq.distal_lengths[order]
    pq.lwrs = pq.lwrs[order]


def _truncate(pq: PQuery, n: int):
    pq.edge_nums = pq.edge_nums[:n]
    pq.logls = pq.logls[:n]
    pq.pendant_lengths = pq.pendant_lengths[:n]
    pq.distal_lengths = pq.distal_lengths[:n]
    pq.lwrs = pq.lwrs[:n]


def filter_pqueries(pqueries: list[PQuery], options: Options):
    """Sort by LWR desc, then cut (set_manipulators.cpp:131-204)."""
    thresh = options.support_threshold
    fmin = max(1, options.filter_min)
    fmax = options.filter_max

    for pq in pqueries:
        order = np.argsort(-pq.lwrs, kind="stable")
        _apply_order(pq, order)
        n = len(pq.lwrs)
        if options.acc_threshold:
            # keep while prefix-sum (before element) < thresh, within
            # [fmin, fmax]
            prefix = np.cumsum(pq.lwrs) - pq.lwrs
            num_kept = int((prefix < thresh).sum())
            num_kept = min(max(num_kept, fmin), fmax, n)
        else:
            num_kept = int((pq.lwrs > thresh).sum())
            if num_kept < fmin:
                num_kept = min(fmin, n)
            if fmax and num_kept > fmax:
                num_kept = fmax
        _truncate(pq, num_kept)
