"""Pipeline stage scheduling: difficulty-proportional node assignment.

Python re-expression of the reference's rebalancing solver
(src/pipeline/schedule.cpp): measured per-stage times are normalized into
difficulties; ``solve`` assigns nodes proportional to difficulty (first and
last stage pinned to one node); ``assign``/``reassign`` compute and migrate
rank->stage maps with minimal movement.

STATUS: forward-looking parity module. Like the reference's own scheduler
(unit-tested but never called from the v0.3.8 ``simple_mpi`` path,
src/pipeline/Pipeline.hpp:35, src/pipeline/schedule.cpp:16-54), this solver
is unit-tested serial math (tests/test_schedule.py) that no runtime
currently consumes: the active distributed mode is plain query data
parallelism, and ``core.pipeline.StreamingPipeline`` records stage timers
that a future cross-host rebalancer would feed into ``assign``/``reassign``.
"""

from __future__ import annotations

import math


def to_difficulty(perstage_avg: list[float]) -> list[float]:
    m = min(perstage_avg)
    return [x / m for x in perstage_avg]


def solve(stages: int, nodes: int, difficulty: list[float]) -> list[int]:
    assert len(difficulty) == stages
    if nodes < stages:
        raise ValueError("Must have more or equal number of nodes than stages")

    total = sum(difficulty)
    x1 = nodes / total
    nps = []
    for i in range(stages):
        if i == 0 or i == stages - 1:
            nps.append(1)
        else:
            nps.append(math.ceil(difficulty[i] * x1))

    while True:
        off_by = sum(nps) - nodes
        if off_by == 0:
            break
        j = nps.index(max(nps))
        nps[j] += 1 if off_by < 0 else -1
    return nps


def assign(local_rank: int, nodes_per_stage: list[int]):
    """Fresh contiguous assignment. Returns (rank_assignment, local_stage)."""
    rank_assignm: list[list[int]] = []
    local_stage = -1
    rank = 0
    for stage, n in enumerate(nodes_per_stage):
        stage_ranks = []
        for _ in range(n):
            stage_ranks.append(rank)
            if rank == local_rank:
                local_stage = stage
            rank += 1
        rank_assignm.append(stage_ranks)
    return rank_assignm, local_stage


def reassign(local_rank: int, nodes_per_stage: list[int],
             rank_assignm: list[list[int]], local_stage: int) -> int:
    """Migrate ranks between stages in place, minimally. Returns the (possibly
    updated) local stage."""
    assert len(nodes_per_stage) == len(rank_assignm)
    cut: list[int] = []
    for i, want in enumerate(nodes_per_stage):
        cur = rank_assignm[i]
        to_rm = len(cur) - want
        for _ in range(max(0, to_rm)):
            cut.append(cur.pop())
    it = iter(cut)
    for i, want in enumerate(nodes_per_stage):
        cur = rank_assignm[i]
        while len(cur) < want:
            rank = next(it)
            if rank == local_rank:
                local_stage = i
            cur.append(rank)
    return local_stage
