"""LWR computation, output filtering and jplace text-format tests
(mirroring the reference's set_manipulators and jplace_util coverage)."""

import json

import numpy as np
import pytest

from epa_ng_tpu.core.lwr import PQuery, compute_and_set_lwr, filter_pqueries
from epa_ng_tpu.io.jplace import JplaceWriter
from epa_ng_tpu.utils.options import Options


def make_pq(logls, edges=None):
    n = len(logls)
    return PQuery(seq_id=0, headers=["q"],
                  edge_nums=np.asarray(edges if edges is not None
                                       else np.arange(n)),
                  logls=np.asarray(logls, dtype=float),
                  pendant_lengths=np.full(n, 0.1),
                  distal_lengths=np.full(n, 0.05))


def test_lwr_softmax():
    pq = make_pq([-100.0, -101.0, -102.0])
    compute_and_set_lwr([pq])
    ex = np.exp([-0.0, -1.0, -2.0])
    assert np.allclose(pq.lwrs, ex / ex.sum())
    assert pq.lwrs.sum() == pytest.approx(1.0)


def test_lwr_extreme_values_no_overflow():
    pq = make_pq([-1e5, -1e5 - 500, -1e5 - 1000])
    compute_and_set_lwr([pq])
    assert np.isfinite(pq.lwrs).all()
    assert pq.lwrs[0] == pytest.approx(1.0)


def test_filter_min_lwr():
    pq = make_pq([-10.0, -11.0, -20.0, -30.0])
    compute_and_set_lwr([pq])
    o = Options(support_threshold=0.01, acc_threshold=False,
                filter_min=1, filter_max=7)
    filter_pqueries([pq], o)
    # placements below 1% LWR dropped
    assert (pq.lwrs > 0.01).all()
    assert len(pq.lwrs) == 2


def test_filter_min_keeps_at_least_one():
    pq = make_pq([-10.0, -10.0, -10.0])
    compute_and_set_lwr([pq])
    o = Options(support_threshold=0.99, acc_threshold=False, filter_min=1)
    filter_pqueries([pq], o)
    assert len(pq.lwrs) == 1  # none above 0.99, but min 1 kept


def test_filter_max_caps():
    pq = make_pq([-10.0] * 20)
    compute_and_set_lwr([pq])
    o = Options(support_threshold=0.0, acc_threshold=False, filter_max=7)
    filter_pqueries([pq], o)
    assert len(pq.lwrs) == 7


def test_filter_accumulated():
    pq = make_pq([-10.0, -11.0, -12.0, -13.0, -14.0])
    compute_and_set_lwr([pq])
    o = Options(support_threshold=0.9, acc_threshold=True,
                filter_min=1, filter_max=7)
    filter_pqueries([pq], o)
    # keep while prefix-sum before the element < 0.9
    kept = len(pq.lwrs)
    lwr_sorted = np.sort(pq.lwrs)[::-1]
    assert np.cumsum(lwr_sorted)[:kept - 1].max() < 0.9 + 1e-12


def test_jplace_text_format(tmp_path):
    pq = make_pq([-1234.5678901234], edges=[5])
    pq.lwrs = np.asarray([1.0])
    w = JplaceWriter(str(tmp_path), "out.jplace", "(A:1.0{0});", "inv")
    w.write([pq])
    w.close()
    text = open(tmp_path / "out.jplace").read()
    doc = json.loads(text)
    assert doc["version"] == 3
    assert doc["fields"] == ["edge_num", "likelihood", "like_weight_ratio",
                             "distal_length", "pendant_length"]
    assert doc["metadata"]["invocation"] == "inv"
    # fixed-point, default precision 10 (reference jplace_writer precision)
    assert "[5, -1234.5678901234, 1.0000000000, 0.0500000000, 0.1000000000]" in text


def test_jplace_precision(tmp_path):
    pq = make_pq([-1.5], edges=[0])
    pq.lwrs = np.asarray([1.0])
    w = JplaceWriter(str(tmp_path), "p3.jplace", "(A:1.0{0});", "inv",
                     precision=3)
    w.write([pq])
    w.close()
    assert "[0, -1.500, 1.000, 0.050, 0.100]" in open(tmp_path / "p3.jplace").read()


def test_jplace_empty_document(tmp_path):
    w = JplaceWriter(str(tmp_path), "empty.jplace", "(A:1.0{0});", "inv")
    w.close()
    doc = json.loads(open(tmp_path / "empty.jplace").read())
    assert doc["placements"] == []


def test_jplace_multiple_chunks_valid_json(tmp_path):
    w = JplaceWriter(str(tmp_path), "multi.jplace", "(A:1.0{0});", "inv")
    for i in range(3):
        pq = make_pq([-1.0], edges=[0])
        pq.lwrs = np.asarray([1.0])
        pq.headers = [f"q{i}"]
        w.write([pq])
    w.close()
    doc = json.loads(open(tmp_path / "multi.jplace").read())
    assert [p["n"][0] for p in doc["placements"]] == ["q0", "q1", "q2"]


def test_shard_merge(tmp_path):
    from epa_ng_tpu.parallel.dist import merge_jplace_shards
    for i in range(3):
        w = JplaceWriter(str(tmp_path), f"out.jplace.shard{i}",
                         "(A:1.0{0});", "inv", fragment=True)
        pq = make_pq([-1.0], edges=[0])
        pq.lwrs = np.asarray([1.0])
        pq.headers = [f"rank{i}"]
        w.write([pq])
        w.close()
    merge_jplace_shards(str(tmp_path), "out.jplace", 3, "(A:1.0{0});", "inv")
    doc = json.loads(open(tmp_path / "out.jplace").read())
    assert [p["n"][0] for p in doc["placements"]] == ["rank0", "rank1", "rank2"]

