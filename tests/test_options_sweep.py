"""Option-combination sweep — the reference's signature test pattern
(test/src/Epatest.hpp all_combinations): the same placement run under all
combinations of {sliding_blo, prescoring, premasking} (+ heuristic modes)
must stay self-consistent: finite logls, anchors stable, valid output."""

import itertools

import numpy as np
import pytest

from epa_ng_tpu.core.engine import PlacementEngine
from epa_ng_tpu.io import fasta as fio
from epa_ng_tpu.models import Model
from epa_ng_tpu.tree import Tree
from epa_ng_tpu.utils.options import Options

D = "/root/reference/test/data"


@pytest.fixture(scope="module")
def data():
    tree = Tree.from_file(f"{D}/ref.tre")
    ref_info = fio.make_msa_info(f"{D}/aln.fasta")
    qry_info = fio.make_msa_info(f"{D}/query.fasta")
    fio.MSAInfo.or_mask(ref_info, qry_info)
    model = Model.from_string("GTR+G")
    return tree, ref_info, qry_info, model


@pytest.mark.parametrize(
    "sliding,prescoring,premasking",
    list(itertools.product([True, False], repeat=3)))
def test_sweep(data, sliding, prescoring, premasking):
    tree, ref_info, qry_info, model = data
    opts = Options(sliding_blo=sliding, prescoring=prescoring,
                   premasking=premasking, blo_block=32)
    ref = fio.build_msa_from_file(f"{D}/aln.fasta", ref_info, premasking)
    qry = fio.build_msa_from_file(f"{D}/query.fasta", qry_info, premasking)
    eng = PlacementEngine(tree, ref, Model.from_string("GTR+G"), opts)
    pqs = eng.place_chunk(qry)
    assert len(pqs) == 2
    for pq in pqs:
        assert np.isfinite(pq.logls).all()
        assert np.isfinite(pq.lwrs).all()
        assert 1 <= len(pq.edge_nums) <= 7
        for e, d, p in zip(pq.edge_nums, pq.distal_lengths,
                           pq.pendant_lengths):
            assert 0.0 <= d <= tree.edge_lengths[e] + 1e-9
            assert p >= 0.0
    # the ML anchors hold under every option combination
    assert pqs[0].edge_nums[0] == 4  # Rat
    assert pqs[1].edge_nums[0] == 3  # Carp


@pytest.mark.parametrize("mode", ["baseball", "fixed"])
def test_other_heuristics(data, mode):
    tree, ref_info, qry_info, model = data
    opts = Options(blo_block=32,
                   baseball=(mode == "baseball"),
                   prescoring_by_percentage=(mode == "fixed"),
                   prescoring_threshold=(0.2 if mode == "fixed" else 0.99999))
    ref = fio.build_msa_from_file(f"{D}/aln.fasta", ref_info, True)
    qry = fio.build_msa_from_file(f"{D}/query.fasta", qry_info, True)
    eng = PlacementEngine(tree, ref, Model.from_string("GTR+G"), opts)
    pqs = eng.place_chunk(qry)
    assert pqs[0].edge_nums[0] == 4
    assert pqs[1].edge_nums[0] == 3


@pytest.mark.parametrize("mode", ["dynamic", "fixed", "baseball"])
def test_fused_equals_exact_all_heuristics(mode):
    """The fused device step (now covering ALL three heuristics, not just
    dynamic) must reproduce the exact host-orchestrated path's placements
    (reference treats the heuristics uniformly, heuristics.hpp:119-127)."""
    from epa_ng_tpu.utils.synth import synth_dataset
    tree, ref, qry = synth_dataset(n_taxa=48, sites=192, n_queries=32,
                                   seed=9)
    opts = Options(blo_block=64,
                   baseball=(mode == "baseball"),
                   prescoring_by_percentage=(mode == "fixed"),
                   prescoring_threshold=(0.15 if mode == "fixed"
                                         else 0.99999))
    eng = PlacementEngine(tree, ref, Model.from_string("GTR+G"), opts)

    handle = eng.place_chunk_async(qry)
    assert handle[0] == "fused", f"{mode} did not take the fused path"
    fused = eng.place_chunk(qry)
    exact = eng._place_chunk_exact(eng.encode_msa(qry), 0)
    for a, b in zip(fused, exact):
        assert a.edge_nums[0] == b.edge_nums[0]
        # candidates at the heuristic cutoff can differ on exact score
        # ties (sub-1e-12 cross-compilation float drift); every placement
        # carrying real weight must agree, aligned by edge id
        da = {int(e): (l, w) for e, l, w in zip(a.edge_nums, a.logls,
                                                a.lwrs)}
        db = {int(e): (l, w) for e, l, w in zip(b.edge_nums, b.logls,
                                                b.lwrs)}
        # the kept VALUE multisets must match exactly...
        np.testing.assert_allclose(np.sort(a.logls), np.sort(b.logls),
                                   atol=1e-6)
        np.testing.assert_allclose(np.sort(a.lwrs), np.sort(b.lwrs),
                                   atol=1e-6)
        # ...and an edge kept by only one path must be an exact score tie
        # with some edge the other path kept instead (filter_max truncates
        # tie groups differently across compilations)
        for e in set(da) ^ set(db):
            l, w = da.get(e) or db.get(e)
            other = db if e in da else da
            assert any(abs(l2 - l) < 1e-6 for l2, _ in other.values()), e
        for e in set(da) & set(db):
            assert da[e][0] == pytest.approx(db[e][0], abs=1e-6)
            assert da[e][1] == pytest.approx(db[e][1], abs=1e-6)


def test_fused_flat_posterior_budget_fallback():
    """Stresses the dynamic pair-budget halving (parallel.mesh): very
    short uninformative reads give flat posteriors, so most queries keep
    many of their top-k candidates — live pairs overflow the halved
    dispatch budget and must come back through the misfit redo (or the
    whole-chunk exact fallback), never silently dropped."""
    import numpy as np

    from epa_ng_tpu.io.fasta import MSA, Sequence
    from epa_ng_tpu.utils.synth import synth_dataset

    tree, ref, _ = synth_dataset(n_taxa=48, sites=192, n_queries=1, seed=9)
    rng = np.random.default_rng(3)
    seqs = []
    for i in range(64):
        # 6-site reads: barely informative -> near-uniform LWR over edges
        start = int(rng.integers(0, 192 - 6))
        s = ["-"] * 192
        for j in range(start, start + 6):
            s[j] = "ACGT"[rng.integers(0, 4)]
        seqs.append(Sequence([f"F{i}"], "".join(s)))
    qry = MSA(sequences=seqs, num_sites=192)

    eng = PlacementEngine(tree, ref, Model.from_string("GTR+G"),
                          Options(blo_block=64))
    fused = eng.place_chunk(qry)
    exact = eng._place_chunk_exact(eng.encode_msa(qry), 0)
    assert len(fused) == len(exact) == 64
    for a, b in zip(fused, exact):
        np.testing.assert_allclose(np.sort(a.logls), np.sort(b.logls),
                                   atol=1e-6)
        np.testing.assert_allclose(np.sort(a.lwrs), np.sort(b.lwrs),
                                   atol=1e-6)


def test_fused_saturation_escalation():
    """A chunk whose queries mostly saturate a tiny candidate budget must
    be rescued by the escalating wide-budget re-dispatch (one fused step
    at 4x/64, then 256) instead of surrendering straight to the
    host-orchestrated exact pass — and produce the exact path's output."""
    import numpy as np

    from epa_ng_tpu.utils.synth import synth_dataset

    tree, ref, qry = synth_dataset(n_taxa=128, sites=192, n_queries=48,
                                   seed=11)
    eng = PlacementEngine(tree, ref, Model.from_string("GTR+G"),
                          Options(blo_block=64, fused_topk=2))
    fused = eng.place_chunk(qry)
    assert eng._escalations > 0, "wide-budget ladder never engaged"
    exact = eng._place_chunk_exact(eng.encode_msa(qry), 0)
    assert len(fused) == len(exact) == 48
    for a, b in zip(fused, exact):
        np.testing.assert_allclose(np.sort(a.logls), np.sort(b.logls),
                                   atol=1e-6)
        assert a.edge_nums[0] == b.edge_nums[0] or abs(
            a.logls[0] - b.logls[0]) <= 1e-6
