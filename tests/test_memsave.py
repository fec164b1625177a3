"""Out-of-core (--memsave) engine: host-RAM reference state, streamed
placement. Cross-path equality against the device-resident engine (the
reference's own test style for its -b paged mode,
/root/reference/test/src/Tiny_Tree.cpp place_from_binary)."""

import json

import numpy as np
import pytest

from epa_ng_tpu.core.engine import PlacementEngine
from epa_ng_tpu.core.memsave import OutOfCoreEngine
from epa_ng_tpu.models import Model
from epa_ng_tpu.utils.options import Options
from epa_ng_tpu.utils.synth import synth_dataset

MODEL = "GTR{1.1/2.9/0.8/1.2/3.4/1}+FU{0.27/0.23/0.24/0.26}+G4{0.6}"


@pytest.fixture(scope="module")
def data():
    return synth_dataset(n_taxa=40, sites=200, n_queries=24, seed=21)


def _compare(a_pqs, b_pqs):
    assert len(a_pqs) == len(b_pqs)
    for a, b in zip(a_pqs, b_pqs):
        np.testing.assert_array_equal(a.edge_nums, b.edge_nums)
        np.testing.assert_allclose(a.logls, b.logls, atol=1e-6)
        np.testing.assert_allclose(a.lwrs, b.lwrs, atol=1e-6)
        np.testing.assert_allclose(a.pendant_lengths, b.pendant_lengths,
                                   atol=1e-9)
        np.testing.assert_allclose(a.distal_lengths, b.distal_lengths,
                                   atol=1e-9)


def test_memsave_equals_resident(data):
    tree, ref, qry = data
    dev = PlacementEngine(tree, ref, Model.from_string(MODEL),
                          Options(blo_block=64))
    ooc = OutOfCoreEngine(tree, ref, Model.from_string(MODEL),
                          Options(blo_block=64, memsave=True))
    # exact-vs-exact (the OOC engine always takes the exact path)
    ec = dev.encode_msa(qry)
    _compare(dev._place_chunk_exact(ec, 0),
             ooc._place_chunk_exact(ooc.encode_msa(qry), 0))


def test_memsave_no_heur_and_no_premask(data):
    tree, ref, qry = data
    for kw in ({"prescoring": False}, {"premasking": False}):
        dev = PlacementEngine(tree, ref, Model.from_string(MODEL),
                              Options(blo_block=64, **kw))
        ooc = OutOfCoreEngine(tree, ref, Model.from_string(MODEL),
                              Options(blo_block=64, memsave=True, **kw))
        _compare(dev._place_chunk_exact(dev.encode_msa(qry), 0),
                 ooc.place_chunk(qry))


def test_memsave_device_footprint(data):
    """With budget 0 (pure streaming) nothing O(E*S) may stay
    device-resident; with a budget, the cache must stay under it."""
    tree, ref, qry = data
    ooc = OutOfCoreEngine(tree, ref, Model.from_string(MODEL),
                          Options(memsave=True, memsave_budget_gb=0.0))
    assert ooc._lookup_table is None and ooc._blo is None
    assert ooc.edges is None
    assert ooc._blo_cache is None and ooc._pre_cache_nblocks == 0
    assert isinstance(ooc._tU_np, np.ndarray)
    assert ooc.host_resident_bytes() > 0
    pqs = ooc.place_chunk(qry)
    assert len(pqs) == len(qry)
    assert ooc.device_cached_bytes() == 0

    budget = 5e-4  # 500 kB: covers a few edges, far below the store
    ooc2 = OutOfCoreEngine(tree, ref, Model.from_string(MODEL),
                           Options(memsave=True, memsave_budget_gb=budget))
    assert 0 <= ooc2._blo_cache_edges < ooc2.num_edges
    ooc2.place_chunk(qry)
    assert ooc2.device_cached_bytes() <= budget * 1e9


def test_memsave_budget_tiers_equal(data):
    """Pure-streaming, partial-cache (hit+miss split) and all-cached
    budgets must all reproduce the device-resident engine exactly."""
    tree, ref, qry = data
    dev = PlacementEngine(tree, ref, Model.from_string(MODEL),
                          Options(blo_block=64))
    expected = dev._place_chunk_exact(dev.encode_msa(qry), 0)
    seen_partial = False
    for gb in (0.0, 5e-4, 100.0):
        ooc = OutOfCoreEngine(tree, ref, Model.from_string(MODEL),
                              Options(blo_block=64, memsave=True,
                                      memsave_budget_gb=gb))
        _compare(expected, ooc.place_chunk(qry))
        if 0 < ooc._blo_cache_edges < ooc.num_edges:
            seen_partial = True
    assert seen_partial, "no budget exercised the mixed hit/miss split"
    # the big budget must cache the full store (device-resident speed)
    assert ooc._blo_cache_edges == ooc.num_edges


def test_memsave_streamed_preplace_matches(data):
    # budget 0 forces the streamed block-by-block preplacement (a default
    # auto budget covers this tiny store entirely and would delegate to
    # the parent's device path, testing nothing)
    tree, ref, qry = data
    dev = PlacementEngine(tree, ref, Model.from_string(MODEL), Options())
    ooc = OutOfCoreEngine(tree, ref, Model.from_string(MODEL),
                          Options(memsave=True, memsave_budget_gb=0.0))
    ec = dev.encode_msa(qry)
    np.testing.assert_allclose(ooc.preplace(ec.codes, ec.ranges),
                               dev.preplace(ec.codes, ec.ranges),
                               rtol=0, atol=1e-7)


def test_memsave_full_cover_runs_fused(data):
    """A covering budget must flip the engine to the parent's fused
    device-resident dispatch (VERDICT r04: --memsave with a warm cache
    should converge to plain-engine speed, and that means the plain
    engine's PATH, not the host-orchestrated exact path)."""
    tree, ref, qry = data
    ooc = OutOfCoreEngine(tree, ref, Model.from_string(MODEL),
                          Options(blo_block=64, memsave=True,
                                  memsave_budget_gb=100.0))
    assert ooc._full_cover
    assert ooc.place_encoded_async(ooc.encode_msa(qry))[0] == "fused"
    dev = PlacementEngine(tree, ref, Model.from_string(MODEL),
                          Options(blo_block=64))
    _compare(dev.place_chunk(qry), ooc.place_chunk(qry))


def test_memsave_pallas_on_budget0_rejected(data):
    tree, ref, _ = data
    with pytest.raises(ValueError, match="pallas"):
        OutOfCoreEngine(tree, ref, Model.from_string(MODEL),
                        Options(memsave=True, memsave_budget_gb=0.0,
                                pallas="on"))


def test_memsave_cli(tmp_path):
    from epa_ng_tpu.cli import main
    D = "/root/reference/test/data"
    out = str(tmp_path) + "/"
    rc = main(["-t", f"{D}/ref.tre", "-s", f"{D}/aln.fasta",
               "-q", f"{D}/query.fasta", "-m", "GTR+G", "--memsave",
               "-w", out, "--redo", "--blo-block", "64"])
    assert rc == 0
    doc = json.load(open(out + "epa_result.jplace"))
    tops = sorted((p["n"][0], p["p"][0][0]) for p in doc["placements"])
    assert tops == [("Carp", 3), ("Rat", 4)]
    # --memsave-budget 0 = pure streaming: identical output end to end
    rc = main(["-t", f"{D}/ref.tre", "-s", f"{D}/aln.fasta",
               "-q", f"{D}/query.fasta", "-m", "GTR+G", "--memsave",
               "--memsave-budget", "0", "-w", out, "--redo",
               "--blo-block", "64"])
    assert rc == 0
    doc0 = json.load(open(out + "epa_result.jplace"))
    # run 1 (auto budget, covers this tiny store -> fused device path)
    # vs run 2 (budget 0 -> pure streaming): same placements; numeric
    # fields may differ in the last couple of printed digits (different
    # f64 reduction trees along the two paths)
    assert len(doc0["placements"]) == len(doc["placements"])
    for a, b in zip(doc0["placements"], doc["placements"]):
        assert a["n"] == b["n"]
        pa, pb = np.asarray(a["p"], float), np.asarray(b["p"], float)
        assert pa.shape == pb.shape
        np.testing.assert_array_equal(pa[:, 0], pb[:, 0])  # edge ids
        np.testing.assert_allclose(pa[:, 1:], pb[:, 1:], rtol=1e-6,
                                   atol=1e-8)


def test_memsave_binary_roundtrip(tmp_path, data):
    from epa_ng_tpu.io.binary import dump_binary, load_binary
    import dataclasses
    tree, ref, qry = data
    opts = Options(blo_block=64)
    dev = PlacementEngine(tree, ref, Model.from_string(MODEL),
                          dataclasses.replace(opts, dump_binary_mode=True))
    path = str(tmp_path / "store.npz")
    dump_binary(dev, path, tree.plain_newick())
    ooc = load_binary(path, dataclasses.replace(opts, memsave=True),
                      engine_cls=OutOfCoreEngine)
    _compare(dev.place_chunk(qry), ooc.place_chunk(qry))


def test_memsave_full_cover_escalation(data):
    """Full-cover --memsave inherits the parent's escalation ladder: a
    tiny fused budget saturates, the wide re-dispatch rescues the chunk
    against the covering cache, output equals the exact path."""
    tree, ref, qry = data
    ooc = OutOfCoreEngine(tree, ref, Model.from_string(MODEL),
                          Options(blo_block=64, memsave=True,
                                  memsave_budget_gb=100.0, fused_topk=2))
    assert ooc._full_cover
    pqs = ooc.place_chunk(qry)
    assert ooc._escalations > 0
    dev = PlacementEngine(tree, ref, Model.from_string(MODEL),
                          Options(blo_block=64))
    exact = dev._place_chunk_exact(dev.encode_msa(qry), 0)
    assert len(pqs) == len(exact)
    for a, b in zip(pqs, exact):
        np.testing.assert_allclose(np.sort(a.logls), np.sort(b.logls),
                                   atol=1e-6)
