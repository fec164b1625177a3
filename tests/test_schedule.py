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
