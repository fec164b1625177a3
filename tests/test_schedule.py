"""Scheduler math tests — mirrors the reference's test/src/schedule.cpp
(the distributed rebalancing solver is tested purely serially there too)."""

import pytest

from epa_ng_tpu.parallel.schedule import assign, reassign, solve, to_difficulty
from epa_ng_tpu.utils.timer import Timer


def test_solve():
    nps = solve(4, 32, [1000.0, 1.0, 1000.0, 1.0])
    assert sum(nps) == 32
    assert nps[0] == 1 and nps[-1] == 1  # first/last stage pinned


def test_solve_rejects_too_few_nodes():
    with pytest.raises(ValueError):
        solve(4, 3, [1.0, 1.0, 1.0, 1.0])


def test_to_difficulty():
    assert to_difficulty([20.0, 2.0, 10.0, 3.0]) == [10.0, 1.0, 5.0, 1.5]


def test_assign():
    for snps in ([15, 1, 15, 1], [1, 1, 1, 1], [2, 0, 1, 1]):
        rank_assignm, local_stage = assign(0, snps)
        for i, stage in enumerate(rank_assignm):
            assert len(stage) == snps[i]
        if snps[0] > 0:
            assert local_stage == 0  # rank 0 lands in the first stage


def test_reassign():
    rank_assignm, local_stage = assign(0, [8, 8, 8, 8])
    for snps in ([15, 1, 15, 1], [2, 14, 1, 15], [30, 0, 1, 1]):
        local_stage = reassign(0, snps, rank_assignm, local_stage)
        for i, stage in enumerate(rank_assignm):
            assert len(stage) == snps[i]
        # every rank still assigned exactly once
        all_ranks = sorted(r for stage in rank_assignm for r in stage)
        assert all_ranks == list(range(32))


def test_timer_pause_resume():
    import time
    t = Timer()
    t.start()
    time.sleep(0.02)
    t.pause()
    time.sleep(0.05)
    t.resume()
    t.stop()
    assert len(t.records) == 1
    assert 0.01 < t.records[0] < 0.045  # the paused 50ms is excluded


def test_streaming_pipeline_order_and_errors():
    from epa_ng_tpu.core.pipeline import StreamingPipeline
    chunks = list(range(10))
    out = []
    it = iter(chunks)
    p = StreamingPipeline(lambda: next(it, None),
                          lambda c, i: c * 2,
                          out.append)
    assert p.run() == 10
    assert out == [c * 2 for c in chunks]

    # errors in the reader propagate
    def bad_read():
        raise RuntimeError("boom")
    p2 = StreamingPipeline(bad_read, lambda c, i: c, lambda r: None)
    with pytest.raises(RuntimeError, match="boom"):
        p2.run()


def test_pipeline_timers_drive_rebalance():
    """Closes the loop the reference never wired either: the streaming
    pipeline's MEASURED per-stage timers feed to_difficulty -> solve ->
    reassign exactly as a cross-host rebalancer would (reference math:
    src/pipeline/schedule.cpp:16-54; exponential-backoff rebalance points
    in src/pipeline/Pipeline.hpp:154-159)."""
    import time

    from epa_ng_tpu.core.pipeline import StreamingPipeline

    def run_skewed(compute_cost, write_cost):
        chunks = iter(range(12))
        pipe = StreamingPipeline(
            lambda: next(chunks, None),
            lambda c, i: (time.sleep(compute_cost), c)[1],
            lambda r: time.sleep(write_cost))
        pipe.run()
        return [pipe.read_timer, pipe.compute_timer, pipe.write_timer]

    # the solver pins the first/last (IO) stages to one node each
    # (schedule.cpp:24-27), so only interior stages scale: model the
    # reference's 4-stage layout (mpihead.hpp:19-22) with two measured
    # compute stages — preplacement-heavy first, thorough-heavy later.
    t1 = run_skewed(0.004, 0.0)   # phase 1: stage "preplace" dominates
    t2 = run_skewed(0.0008, 0.0)
    stage_avg = [max(t1[0].avg(), 1e-6), max(t1[1].avg(), 1e-6),
                 max(t2[1].avg(), 1e-6), max(t1[2].avg(), 1e-6)]
    nps = solve(4, 16, to_difficulty(stage_avg))
    assert sum(nps) == 16
    assert nps[0] == 1 and nps[3] == 1          # IO stages pinned
    assert nps[1] == max(nps) and nps[1] >= 9   # slow stage gets the nodes
    rank_assignm, local_stage = assign(0, nps)

    # phase 2: the skew flips to the other compute stage -> reassign
    # migrates ranks with minimal movement
    stage_avg2 = [stage_avg[0], stage_avg[2], stage_avg[1], stage_avg[3]]
    nps2 = solve(4, 16, to_difficulty(stage_avg2))
    assert nps2[2] == max(nps2) and nps2[2] >= 9
    local_stage = reassign(0, nps2, rank_assignm, local_stage)
    assert sorted(r for st in rank_assignm for r in st) == list(range(16))
    assert [len(st) for st in rank_assignm] == nps2


def test_calibration_rate_positive():
    """PlacementEngine.calibration_rate: the measured per-host difficulty
    input of the adaptive split runs end to end and yields a sane rate."""
    from epa_ng_tpu.core.engine import PlacementEngine
    from epa_ng_tpu.models import Model
    from epa_ng_tpu.utils.options import Options
    from epa_ng_tpu.utils.synth import synth_dataset

    tree, ref, _ = synth_dataset(n_taxa=12, sites=64, n_queries=1, seed=3)
    eng = PlacementEngine(
        tree, ref,
        Model.from_string("GTR{1.2/2.4/0.9/1.1/3.1/1}"
                          "+FU{0.28/0.22/0.24/0.26}+G4{0.7}"),
        Options(compute_dtype="f64"))
    rate = eng.calibration_rate(n=32)
    assert rate > 0
