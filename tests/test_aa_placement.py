"""Amino-acid placement end-to-end (BASELINE config 3): 20-state CLVs,
PROTGTR model parsed from a real RAxML8 protein info file, AA charmaps with
ambiguity codes, heuristic + thorough placement, jplace output."""

import json

import numpy as np
import pytest

from epa_ng_tpu.cli import main
from epa_ng_tpu.core.engine import PlacementEngine
from epa_ng_tpu.io import fasta as fio
from epa_ng_tpu.io.model_files import parse_model_file
from epa_ng_tpu.models import Model
from epa_ng_tpu.tree import Tree
from epa_ng_tpu.utils.options import Options

D = "/root/reference/test/data"

AA_TREE = ("(Cow:0.2,((Chicken:0.3,(Human:0.25,Loach:0.45):0.1):0.05,"
           "(Mouse:0.15,(Seal:0.2,Whale:0.1):0.08):0.12):0.06,Frog:0.35);")


@pytest.fixture(scope="module")
def aa_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("aa")
    tree_file = tmp / "aa.tre"
    tree_file.write_text(AA_TREE + "\n")
    return str(tmp), str(tree_file)


def test_aa_place_engine(aa_setup):
    _, tree_file = aa_setup
    model = Model.from_string(parse_model_file(f"{D}/modelfiles/rax8_prot"))
    assert model.num_states == 20
    tree = Tree.from_file(tree_file)
    ref_info = fio.make_msa_info(f"{D}/AA_aln.fasta")
    qry_info = fio.make_msa_info(f"{D}/AA_query.fasta")
    fio.MSAInfo.or_mask(ref_info, qry_info)
    ref = fio.build_msa_from_file(f"{D}/AA_aln.fasta", ref_info, True)
    qry = fio.build_msa_from_file(f"{D}/AA_query.fasta", qry_info, True)
    eng = PlacementEngine(tree, ref, model, Options(blo_block=32))
    assert np.isfinite(eng.ref_tree_logl)
    pqs = eng.place_chunk(qry)
    assert [pq.headers[0] for pq in pqs] == ["Rat", "Carp"]
    for pq in pqs:
        assert np.isfinite(pq.logls).all()
        assert 1 <= len(pq.edge_nums) <= 7

    # strong check: preplacement scores equal brute-force likelihoods of
    # the extended tree (20-state path, independent scipy-expm recursion)
    from epa_ng_tpu.ops.newton import DEFAULT_PENDANT
    from tests.reference_impl import brute_tree_loglikelihood
    from tests.test_placement import attach_query_newick
    codes, qmasks, ranges = eng._encode_chunk(qry)
    scores = eng.preplace(codes, ranges)
    for edge in [0, 6, 10]:
        half = tree.edge_lengths[edge] / 2
        nwk = attach_query_newick(tree, edge, DEFAULT_PENDANT, half)
        ext = Tree.from_string(nwk)
        msa2 = fio.MSA(num_sites=ref.num_sites)
        msa2.sequences = list(ref.sequences)
        msa2.append("QUERY", qry[0].sequence)
        want = brute_tree_loglikelihood(ext, msa2, model)
        # preplacement ignores the leading/trailing gap range; emulate by
        # restricting the brute force... instead compare with full range
        b, s = ranges[0]
        if b == 0 and s == ref.num_sites:
            assert scores[0, edge] == pytest.approx(want, abs=1e-5)

    # and the thorough logl of the winner matches brute force at the
    # optimized lengths (range-restricted queries excluded above may still
    # be checked here because gaps outside the range contribute logl 0)
    rat = pqs[0]
    edge = int(rat.edge_nums[0])
    nwk = attach_query_newick(tree, edge, rat.pendant_lengths[0],
                              rat.distal_lengths[0])
    ext = Tree.from_string(nwk)
    msa2 = fio.MSA(num_sites=ref.num_sites)
    msa2.sequences = list(ref.sequences)
    msa2.append("QUERY", qry[0].sequence)
    want = brute_tree_loglikelihood(ext, msa2, model)
    b, s = eng._encode_chunk(qry)[2][0]
    if b == 0 and s == ref.num_sites:
        assert rat.logls[0] == pytest.approx(want, abs=1e-5)


def test_aa_place_cli(aa_setup):
    tmp, tree_file = aa_setup
    rc = main(["-t", tree_file, "-s", f"{D}/AA_aln.fasta",
               "-q", f"{D}/AA_query.fasta",
               "-m", f"{D}/modelfiles/rax8_prot",
               "-w", tmp + "/", "--redo", "--blo-block", "32"])
    assert rc == 0
    doc = json.load(open(tmp + "/epa_result.jplace"))
    assert sorted(p["n"][0] for p in doc["placements"]) == ["Carp", "Rat"]


def test_lg_gamma_placement(aa_setup):
    """BASELINE config 3 verbatim: LG+G named-model placement. Preplacement
    scores cross-checked against an independent scipy-expm brute force of
    the extended tree likelihood."""
    _, tree_file = aa_setup
    model = Model.from_string("LG+G4{0.75}")
    tree = Tree.from_file(tree_file)
    ref_info = fio.make_msa_info(f"{D}/AA_aln.fasta")
    qry_info = fio.make_msa_info(f"{D}/AA_query.fasta")
    fio.MSAInfo.or_mask(ref_info, qry_info)
    ref = fio.build_msa_from_file(f"{D}/AA_aln.fasta", ref_info, True)
    qry = fio.build_msa_from_file(f"{D}/AA_query.fasta", qry_info, True)
    eng = PlacementEngine(tree, ref, model, Options(blo_block=32))
    assert np.isfinite(eng.ref_tree_logl)

    from epa_ng_tpu.ops.newton import DEFAULT_PENDANT
    from tests.reference_impl import brute_tree_loglikelihood
    from tests.test_placement import attach_query_newick
    codes, qmasks, ranges = eng._encode_chunk(qry)
    scores = eng.preplace(codes, ranges)
    checked = 0
    for edge in [0, 4, 9]:
        half = tree.edge_lengths[edge] / 2
        nwk = attach_query_newick(tree, edge, DEFAULT_PENDANT, half)
        ext = Tree.from_string(nwk)
        msa2 = fio.MSA(num_sites=ref.num_sites)
        msa2.sequences = list(ref.sequences)
        msa2.append("QUERY", qry[0].sequence)
        want = brute_tree_loglikelihood(ext, msa2, model)
        b, s = ranges[0]
        if b == 0 and s == ref.num_sites:
            assert scores[0, edge] == pytest.approx(want, abs=1e-5)
            checked += 1
    assert checked > 0

    pqs = eng.place_chunk(qry)
    assert [pq.headers[0] for pq in pqs] == ["Rat", "Carp"]
    for pq in pqs:
        assert np.isfinite(pq.logls).all()
        assert np.all(pq.lwrs >= 0) and pq.lwrs.sum() <= 1 + 1e-6


def test_dayhoff_zero_rates_placement(aa_setup):
    """Dayhoff's structural zero exchangeabilities must survive the
    eigendecomposition path (reference: libpll handles zero rates)."""
    _, tree_file = aa_setup
    model = Model.from_string("DAYHOFF+G4{0.9}")
    tree = Tree.from_file(tree_file)
    ref_info = fio.make_msa_info(f"{D}/AA_aln.fasta")
    qry_info = fio.make_msa_info(f"{D}/AA_query.fasta")
    fio.MSAInfo.or_mask(ref_info, qry_info)
    ref = fio.build_msa_from_file(f"{D}/AA_aln.fasta", ref_info, True)
    qry = fio.build_msa_from_file(f"{D}/AA_query.fasta", qry_info, True)
    eng = PlacementEngine(tree, ref, model, Options(blo_block=32))
    assert np.isfinite(eng.ref_tree_logl)
    pqs = eng.place_chunk(qry)
    for pq in pqs:
        assert np.isfinite(pq.logls).all()
