"""Binary (2-state) and unphased-genotype (10-state diploid) data types.

The reference's vendored raxml-ng Model supports DataType::binary and
DataType::diploid10 with the pll_map_bin / pll_map_diploid10 character maps
(reference: src/core/raxml/types.hpp:18, src/core/raxml/Model.cpp:33-56).
These tests cover the model database (GTJC/GTHKY4/GTGTR4/GTGTR, BIN), the
character maps, and end-to-end placement cross-checked against the
independent scipy-expm brute force.
"""

import numpy as np
import pytest

from epa_ng_tpu.core.engine import PlacementEngine
from epa_ng_tpu.io import fasta as fio
from epa_ng_tpu.models import Model
from epa_ng_tpu.models.charmaps import (GT_STATES, encode_lookup_cols,
                                        encode_states, lookup_chars,
                                        mask_to_clv_rows)
from epa_ng_tpu.models.model import DataType, ModelError, _gt_expand
from epa_ng_tpu.tree import Tree
from epa_ng_tpu.utils.options import Options

from tests.reference_impl import brute_tree_loglikelihood


# --- model database ---------------------------------------------------------

def test_gt_model_detection():
    for name, states in [("GTJC", 10), ("GTHKY4", 10), ("GTGTR4", 10),
                         ("GTGTR", 10), ("BIN", 2)]:
        m = Model.from_string(name)
        assert m.num_states == states
    assert Model.from_string("GTJC").data_type == DataType.DIPLOID10
    assert Model.from_string("BIN").data_type == DataType.BINARY


def test_gtgtr4_user_rates():
    m = Model.from_string("GTGTR4{1.1/2.9/0.8/1.2/3.4/2.0}+FE+G4{0.7}")
    assert len(m.subst_rates) == 45
    # pair order of upper triangle: (AA,CC) differ in both alleles -> 0
    assert m.subst_rates[0] == 0.0
    # (AA,AC) differ by one allele A->C: rate AC / rate GT = 1.1/2.0
    i_AC = _pair_index("AA", "AC")
    assert m.subst_rates[i_AC] == pytest.approx(1.1 / 2.0)
    # (CT,GT) differ by C->G: rate CG / rate GT
    i_last = _pair_index("CT", "GT")
    assert m.subst_rates[i_last] == pytest.approx(1.2 / 2.0)
    assert m.num_ratecats == 4
    assert np.allclose(m.base_freqs, 0.1)


def test_gthky4_rates():
    m = Model.from_string("GTHKY4{1/2.5}")
    # transitions (AG, CT) get rate 2.5, transversions 1
    assert m.subst_rates[_pair_index("AA", "AG")] == pytest.approx(2.5)
    assert m.subst_rates[_pair_index("AA", "AC")] == pytest.approx(1.0)


def test_gt_bad_rate_count():
    with pytest.raises(ModelError):
        Model.from_string("GTGTR4{1/2/3}")
    with pytest.raises(ModelError):
        Model.from_string("BIN{1/2}")


def _pair_index(a: str, b: str) -> int:
    i = GT_STATES.index(a)
    j = GT_STATES.index(b)
    if i > j:
        i, j = j, i
    k = 0
    for x in range(10):
        for y in range(x + 1, 10):
            if (x, y) == (i, j):
                return k
            k += 1
    raise AssertionError


def test_gt_expand_structural_zeros():
    rates = _gt_expand(np.arange(1.0, 7.0))
    k = 0
    for i in range(10):
        for j in range(i + 1, 10):
            a, b = set(GT_STATES[i]), set(GT_STATES[j])
            # unphased genotypes sharing no allele OR homozygote pairs
            # cannot interchange in one mutation
            one_step = len(set(GT_STATES[i]) & set(GT_STATES[j])) > 0 and not (
                len(a) == 1 and len(b) == 1)
            assert (rates[k] > 0) == one_step, (GT_STATES[i], GT_STATES[j])
            k += 1


# --- character maps ---------------------------------------------------------

def test_gt_charmap():
    masks = encode_states("ACGTMRSWYK", 10)
    assert list(masks) == [1 << k for k in range(10)]
    # U aliases T, N/-/? are all-states, lowercase folds
    assert encode_states("u", 10)[0] == 1 << 3
    assert encode_states("N-?", 10).tolist() == [1023, 1023, 1023]
    with pytest.raises(ValueError):
        encode_states("B", 10)  # 3-fold ambiguity invalid for genotypes
    cols = encode_lookup_cols("acgtu-n", 10)
    chars = lookup_chars(10)
    assert chars[cols[4]] == "T"   # u -> T column
    assert chars[cols[5]] == "-"
    assert chars[cols[6]] == "-"   # n -> gap column


def test_bin_charmap():
    masks = encode_states("01-?", 2)
    assert masks.tolist() == [1, 2, 3, 3]
    clvs = mask_to_clv_rows(masks, 2)
    assert clvs.tolist() == [[1, 0], [0, 1], [1, 1], [1, 1]]


# --- end-to-end placement with brute-force cross-check ----------------------

GT_TREE = "((tA:0.2,tB:0.3):0.1,(tC:0.25,tD:0.15):0.2,tE:0.4);"
GT_SEQS = {
    "tA": "AAMMCCGGTTKYRAWSCAGT",
    "tB": "AAMCCCGGTAKYRAWSCAGT",
    "tC": "ACMMCGGGTTKWRAWSMAGT",
    "tD": "ACMMCGGTTTYWRTWSMAGG",
    "tE": "CCSMCGGTTTYWGTWSMAGG",
}
GT_QUERY = "AAMMCCGGTTKYRAWSCAGG"

BIN_TREE = "((b0:0.2,b1:0.3):0.1,(b2:0.25,b3:0.15):0.2,b4:0.4);"
BIN_SEQS = {
    "b0": "0011010011110000",
    "b1": "0011010111110000",
    "b2": "0111011011010010",
    "b3": "0111001011010110",
    "b4": "1111001010010111",
}
BIN_QUERY = "0011010011110100"


def _make(tmp_path, tree_str, seqs):
    tree_file = tmp_path / "t.tre"
    tree_file.write_text(tree_str + "\n")
    tree = Tree.from_file(str(tree_file))
    msa = fio.MSA()
    for k, v in seqs.items():
        msa.append(k, v)
    return tree, msa


@pytest.mark.parametrize("model_str,tree_str,seqs,query,states", [
    ("GTGTR4{1.5/2.5/0.8/1.2/3.0/1.0}+FE+G4{0.8}", GT_TREE, GT_SEQS,
     GT_QUERY, 10),
    ("BIN+G2{1.2}", BIN_TREE, BIN_SEQS, BIN_QUERY, 2),
])
def test_place_end_to_end(tmp_path, model_str, tree_str, seqs, query, states):
    model = Model.from_string(model_str)
    assert model.num_states == states
    tree, ref = _make(tmp_path, tree_str, seqs)
    eng = PlacementEngine(tree, ref, model, Options(blo_block=32))

    # reference-tree logl against the independent brute force
    want = brute_tree_loglikelihood(tree, ref, model)
    assert eng.ref_tree_logl == pytest.approx(want, abs=1e-5)

    qry = fio.MSA(num_sites=ref.num_sites)
    qry.append("q1", query)
    pqs = eng.place_chunk(qry)
    assert len(pqs) == 1
    assert np.isfinite(pqs[0].logls).all()
    # filters may drop low-LWR rows: sum <= 1, dominated by the kept ones
    assert (pqs[0].lwrs >= 0).all()
    assert 0.5 < pqs[0].lwrs.sum() <= 1.0 + 1e-9

    # preplacement scores equal brute-force extended-tree likelihoods
    from epa_ng_tpu.ops.newton import DEFAULT_PENDANT
    from tests.test_placement import attach_query_newick
    codes, qmasks, ranges = eng._encode_chunk(qry)
    scores = eng.preplace(codes, ranges)
    for edge in [0, 3, tree.n_edges - 1]:
        half = tree.edge_lengths[edge] / 2
        ext = Tree.from_string(
            attach_query_newick(tree, edge, DEFAULT_PENDANT, half))
        msa2 = fio.MSA(num_sites=ref.num_sites)
        msa2.sequences = list(ref.sequences)
        msa2.append("QUERY", query)
        want = brute_tree_loglikelihood(ext, msa2, model)
        assert scores[0, edge] == pytest.approx(want, abs=1e-5)
