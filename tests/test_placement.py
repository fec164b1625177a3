"""Placement engine tests.

Independence strategy: preplacement scores and optimized placements are
checked against brute-force likelihoods of the *extended* tree (query
attached to the edge via newick surgery, evaluated by the scipy-expm
recursive implementation) — a completely separate code path from the edge
tensors / lookup / Newton kernels.

Semantic anchors: on the 8-taxon test data the brute-force per-edge optima
(scipy Nelder-Mead over (pendant, distal) of the extended tree) are
Rat -> edge 4 (logl -4923.0) and Carp -> edge 3 (logl -5031.3); the engine
must reproduce those. (Note the A..H tip naming does NOT correspond to the
Seal/Whale naming of test/data/raxml_output.jplace - by nearest-sequence
identity, E is the Rat-like taxon and D the Carp-like one.)
"""

import numpy as np
import pytest

from epa_ng_tpu.core.engine import PlacementEngine
from epa_ng_tpu.io import fasta as fio
from epa_ng_tpu.models import Model
from epa_ng_tpu.ops.newton import DEFAULT_PENDANT
from epa_ng_tpu.tree import Tree
from epa_ng_tpu.utils.options import Options
from tests.reference_impl import brute_tree_loglikelihood

D = "/root/reference/test/data"


def attach_query_newick(tree: Tree, edge: int, pendant: float,
                        distal: float, qname: str = "QUERY") -> str:
    """Newick of the tree with a query tip attached to `edge`, `distal` away
    from the child node of the edge."""
    lengths = tree.edge_lengths
    child = int(tree.edge_child[edge])

    def rec(nid: int) -> str:
        if tree.node_children[nid]:
            inner = ",".join(rec(c) for c in tree.node_children[nid])
            body = f"({inner}){tree.node_label[nid] or ''}"
        else:
            body = tree.node_label[nid] or ""
        if nid == tree.vroot:
            return body
        el = lengths[tree.node_edge[nid]]
        if nid == child:
            prox = el - distal
            return (f"({body}:{distal:.12f},{qname}:{pendant:.12f})"
                    f":{prox:.12f}")
        return f"{body}:{el:.12f}"

    kids = tree.node_children[tree.vroot]
    return "(" + ",".join(rec(c) for c in kids) + ");"


@pytest.fixture(scope="module")
def engine():
    tree = Tree.from_file(f"{D}/ref.tre")
    info = fio.make_msa_info(f"{D}/aln.fasta")
    msa = fio.build_msa_from_file(f"{D}/aln.fasta", info, premask=False)
    model = Model.from_string("GTR+G")
    opts = Options(premasking=False, blo_block=64)
    return PlacementEngine(tree, msa, model, opts)


@pytest.fixture(scope="module")
def queries():
    info = fio.make_msa_info(f"{D}/query.fasta")
    return fio.build_msa_from_file(f"{D}/query.fasta", info, premask=False)


def _extended_brute_logl(engine, query, edge, pendant, distal):
    nwk = attach_query_newick(engine.tree, edge, pendant, distal)
    ext = Tree.from_string(nwk)
    msa = fio.MSA(num_sites=engine.num_sites)
    ref_by_label = {}
    # rebuild ref MSA from tip CLVs is awkward; reread the file
    info = fio.make_msa_info(f"{D}/aln.fasta")
    for s in fio.build_msa_from_file(f"{D}/aln.fasta", info, premask=False):
        msa.sequences.append(s)
    msa.append("QUERY", query.sequence)
    return brute_tree_loglikelihood(ext, msa, engine.model)


def test_preplace_scores_match_extended_tree(engine, queries):
    """Lookup-table gather scores == brute-force extended-tree logl at the
    preplacement geometry (half/half + default pendant)."""
    codes, qmasks, ranges = engine._encode_chunk(queries)
    scores = engine.preplace(codes, ranges)
    assert scores.shape == (2, 13)
    for qi in [0, 1]:
        for edge in [0, 2, 6, 12]:
            half = engine.tree.edge_lengths[edge] / 2
            want = _extended_brute_logl(engine, queries[qi], edge,
                                        DEFAULT_PENDANT, half)
            assert scores[qi, edge] == pytest.approx(want, abs=1e-6), (qi, edge)


def test_place_chunk_semantic_anchors(engine, queries):
    pqs = engine.place_chunk(queries)
    assert len(pqs) == 2
    rat = pqs[0]
    carp = pqs[1]
    assert rat.headers == ["Rat"]
    assert carp.headers == ["Carp"]
    # brute-force-optimal edges (see module docstring)
    assert rat.edge_nums[0] == 4
    assert carp.edge_nums[0] == 3
    # LWRs sorted desc, sum <= 1
    for pq in pqs:
        assert (np.diff(pq.lwrs) <= 1e-12).all()
        assert pq.lwrs.sum() <= 1.0 + 1e-9
        assert np.isfinite(pq.logls).all()
        # filter defaults: max 7 placements
        assert 1 <= len(pq.edge_nums) <= 7
        # distal within branch
        for e, d in zip(pq.edge_nums, pq.distal_lengths):
            assert 0.0 <= d <= engine.tree.edge_lengths[e] + 1e-12


def test_blo_result_matches_extended_tree_logl(engine, queries):
    """The optimized logl equals the brute-force likelihood of the extended
    tree at the optimized branch lengths."""
    pqs = engine.place_chunk(queries)
    rat = pqs[0]
    edge = int(rat.edge_nums[0])
    got = rat.logls[0]
    want = _extended_brute_logl(engine, queries[0], edge,
                                rat.pendant_lengths[0],
                                rat.distal_lengths[0])
    assert got == pytest.approx(want, abs=1e-6)


def test_blo_never_worse_than_start(engine, queries):
    """The optimizer may stop early (the reference rolls back and breaks on a
    worse joint step, optimize.cpp:224-232 — it is not a global optimizer),
    but it must never return less than the unoptimized starting geometry,
    which is exactly the preplacement score (pendant=-log(0.9), half/half)."""
    codes, qmasks, ranges = engine._encode_chunk(queries)
    scores = engine.preplace(codes, ranges)
    from epa_ng_tpu.core import heuristics
    pair_e, pair_q = heuristics.all_work(len(queries), engine.num_edges)
    logl, _, _ = engine._thorough(pair_e, pair_q, codes, ranges)
    for l, e, q in zip(logl, pair_e, pair_q):
        assert l >= scores[q, e] - 1e-8, (e, q, l, scores[q, e])


def test_no_heur_same_top_placement(engine, queries):
    """--no-heur must agree with the heuristic on the best placement
    (reference test strategy: cross-path equality)."""
    pq_heur = engine.place_chunk(queries)
    engine.options.prescoring = False
    try:
        pq_full = engine.place_chunk(queries)
    finally:
        engine.options.prescoring = True
    for a, b in zip(pq_heur, pq_full):
        assert a.edge_nums[0] == b.edge_nums[0]
        assert a.logls[0] == pytest.approx(b.logls[0], abs=1e-9)


@pytest.fixture(scope="module")
def engine_pinv():
    """Engine under an invariant-sites model (exercises the p-inv mixture
    in the lookup table, the thorough path, and the ref-tree logl check)."""
    tree = Tree.from_file(f"{D}/ref.tre")
    info = fio.make_msa_info(f"{D}/aln.fasta")
    msa = fio.build_msa_from_file(f"{D}/aln.fasta", info, premask=False)
    model = Model.from_string(
        "GTR{1.2/2.8/0.9/1.1/3.1/1}+FU{0.27/0.23/0.24/0.26}"
        "+IU{0.2}+G4{0.7}")
    opts = Options(premasking=False, blo_block=64)
    return PlacementEngine(tree, msa, model, opts)


def test_pinv_preplace_scores_match_extended_tree(engine_pinv, queries):
    """Preplacement with p-inv: the per-(query, edge) lookup scores must
    equal the brute-force extended-tree likelihood, whose invariant-site
    intersection includes the query tip (reference semantics: the lookup
    table carries a per-character invariant term, Lookup_Store analog)."""
    codes, qmasks, ranges = engine_pinv._encode_chunk(queries)
    scores = engine_pinv.preplace(codes, ranges)
    for qi in [0, 1]:
        for edge in [0, 3, 4, 9]:
            half = engine_pinv.tree.edge_lengths[edge] / 2
            want = _extended_brute_logl(engine_pinv, queries[qi], edge,
                                        DEFAULT_PENDANT, half)
            assert scores[qi, edge] == pytest.approx(want, abs=1e-6), (
                qi, edge)


def test_pinv_blo_matches_extended_tree(engine_pinv, queries):
    """Thorough placement with p-inv: optimized logl == brute force of the
    extended tree at the optimized (pendant, distal)."""
    pqs = engine_pinv.place_chunk(queries)
    for qi, pq in enumerate(pqs):
        edge = int(pq.edge_nums[0])
        want = _extended_brute_logl(engine_pinv, queries[qi], edge,
                                    pq.pendant_lengths[0],
                                    pq.distal_lengths[0])
        assert pq.logls[0] == pytest.approx(want, abs=1e-6), qi


def test_empirical_pinv_outside_opt_model(queries):
    """+IC without --opt-model computes the empirical invariant-site
    fraction from the reference alignment at engine init (reference
    grammar: src/core/raxml/Model.cpp:355-376) and places identically to
    an explicit +IU{that value} — no silent pinv==0 no-op."""
    tree = Tree.from_file(f"{D}/ref.tre")
    info = fio.make_msa_info(f"{D}/aln.fasta")
    msa = fio.build_msa_from_file(f"{D}/aln.fasta", info, premask=False)
    base = "GTR{1.2/2.8/0.9/1.1/3.1/1}+FU{0.27/0.23/0.24/0.26}+G4{0.7}"
    opts = Options(premasking=False, blo_block=64)

    m_ic = Model.from_string(base + "+IC")
    assert m_ic.pinv == 0.0
    eng_ic = PlacementEngine(tree, msa, m_ic, opts)
    # the alignment has invariant columns, so the empirical value is real
    assert 0.0 < m_ic.pinv < 1.0

    m_iu = Model.from_string(base + "+IU{" + repr(m_ic.pinv) + "}")
    eng_iu = PlacementEngine(Tree.from_file(f"{D}/ref.tre"), msa, m_iu,
                             Options(premasking=False, blo_block=64))
    assert eng_ic.ref_tree_logl == pytest.approx(eng_iu.ref_tree_logl,
                                                 abs=1e-9)
    # and differs from the pinv-less model: the +IC is not a no-op
    eng_0 = PlacementEngine(Tree.from_file(f"{D}/ref.tre"), msa,
                            Model.from_string(base),
                            Options(premasking=False, blo_block=64))
    assert abs(eng_ic.ref_tree_logl - eng_0.ref_tree_logl) > 1e-3

    pq_ic = eng_ic.place_chunk(queries)
    pq_iu = eng_iu.place_chunk(queries)
    for a, b in zip(pq_ic, pq_iu):
        assert a.edge_nums.tolist() == b.edge_nums.tolist()
        np.testing.assert_allclose(a.logls, b.logls, atol=1e-9)


def test_pattern_compression_invisible(queries):
    """Site-pattern compression (the SITE_REPEATS analog, reference:
    src/io/file_io.cpp:216-220) must be semantically invisible: identical
    ref-tree logl and identical placements with it on and off. aln.fasta
    is pattern-heavy (705 columns, far fewer unique patterns), so the
    compressed path genuinely runs compressed here."""
    tree = Tree.from_file(f"{D}/ref.tre")
    info = fio.make_msa_info(f"{D}/aln.fasta")
    msa = fio.build_msa_from_file(f"{D}/aln.fasta", info, premask=False)
    base = "GTR{1.2/2.8/0.9/1.1/3.1/1}+FU{0.27/0.23/0.24/0.26}+G4{0.7}"

    eng_c = PlacementEngine(tree, msa, Model.from_string(base),
                            Options(premasking=False, blo_block=64))
    assert eng_c._site2pat is not None  # compression engaged
    assert len(eng_c._pat_first_idx) < msa.num_sites

    eng_f = PlacementEngine(
        Tree.from_file(f"{D}/ref.tre"), msa, Model.from_string(base),
        Options(premasking=False, blo_block=64, pattern_compression=False))
    assert eng_f._site2pat is None

    assert eng_c.ref_tree_logl == pytest.approx(eng_f.ref_tree_logl,
                                                abs=1e-9)
    # the expanded BLO store agrees to machine precision (XLA may
    # reassociate reductions across the different widths -> ~1 ulp)
    np.testing.assert_allclose(np.asarray(eng_c.blo.tU),
                               np.asarray(eng_f.blo.tU), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(eng_c.blo.ls),
                               np.asarray(eng_f.blo.ls),
                               rtol=1e-12, atol=1e-12)

    pq_c = eng_c.place_chunk(queries)
    pq_f = eng_f.place_chunk(queries)
    for a, b in zip(pq_c, pq_f):
        assert a.edge_nums.tolist() == b.edge_nums.tolist()
        np.testing.assert_allclose(a.logls, b.logls, atol=1e-9)
        np.testing.assert_allclose(a.pendant_lengths, b.pendant_lengths,
                                   atol=1e-12)


def test_pattern_compression_with_pinv(queries):
    """Compression composes with p-inv: the per-pattern invariant terms
    equal the per-site ones."""
    info = fio.make_msa_info(f"{D}/aln.fasta")
    msa = fio.build_msa_from_file(f"{D}/aln.fasta", info, premask=False)
    mstr = ("GTR{1.2/2.8/0.9/1.1/3.1/1}+FU{0.27/0.23/0.24/0.26}"
            "+IU{0.2}+G4{0.7}")
    eng_c = PlacementEngine(Tree.from_file(f"{D}/ref.tre"), msa,
                            Model.from_string(mstr),
                            Options(premasking=False, blo_block=64))
    eng_f = PlacementEngine(
        Tree.from_file(f"{D}/ref.tre"), msa, Model.from_string(mstr),
        Options(premasking=False, blo_block=64, pattern_compression=False))
    assert eng_c._site2pat is not None
    assert eng_c.ref_tree_logl == pytest.approx(eng_f.ref_tree_logl,
                                                abs=1e-9)
    codes, _, ranges = eng_c._encode_chunk(queries)
    np.testing.assert_allclose(eng_c.preplace(codes, ranges),
                               eng_f.preplace(codes, ranges), atol=1e-9)
