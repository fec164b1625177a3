"""Binary CLV store round-trips for EVERY model family.

The reference's binary store serializes the partition's numeric arrays and
its tests assert placement equality through a dump/load cycle
(/root/reference/test/src/Tiny_Tree.cpp:167 place_from_binary); these tests
mirror that: dump -> load -> place must equal fresh-engine placement for
DNA(+G/+I/+ASC/+R), protein, BIN, diploid10, and matrix mixtures.
"""

import numpy as np
import pytest

from epa_ng_tpu.core.engine import PlacementEngine
from epa_ng_tpu.io import fasta as fio
from epa_ng_tpu.io.binary import dump_binary, load_binary
from epa_ng_tpu.models import Model
from epa_ng_tpu.models import aa_matrices
from epa_ng_tpu.tree import Tree
from epa_ng_tpu.utils.options import Options

from tests.test_gt_bin import (BIN_QUERY, BIN_SEQS, BIN_TREE, GT_QUERY,
                               GT_SEQS, GT_TREE)

D = "/root/reference/test/data"


def _roundtrip(tmp_path, tree, ref, qry, model, opts=None):
    import dataclasses
    opts = opts or Options(blo_block=64)
    # the dumping engine keeps the raw edge tensors (dump mode); the
    # loaded engine exercises the freed-EdgeTensors placement path
    eng = PlacementEngine(tree, ref, model,
                          dataclasses.replace(opts, dump_binary_mode=True))
    want = eng.place_chunk(qry)

    path = str(tmp_path / "store.npz")
    dump_binary(eng, path, tree.plain_newick())
    eng2 = load_binary(path, opts)
    assert eng2.ref_tree_logl == pytest.approx(eng.ref_tree_logl, abs=1e-6)
    got = eng2.place_chunk(qry)

    assert len(got) == len(want)
    for a, b in zip(want, got):
        np.testing.assert_array_equal(a.edge_nums, b.edge_nums)
        np.testing.assert_allclose(a.logls, b.logls, rtol=0, atol=1e-9)
        np.testing.assert_allclose(a.lwrs, b.lwrs, atol=1e-12)
        np.testing.assert_allclose(a.pendant_lengths, b.pendant_lengths,
                                   atol=1e-12)
        np.testing.assert_allclose(a.distal_lengths, b.distal_lengths,
                                   atol=1e-12)
    return eng, eng2


def _dna_data():
    ref_info = fio.make_msa_info(f"{D}/aln.fasta")
    qry_info = fio.make_msa_info(f"{D}/query.fasta")
    fio.MSAInfo.or_mask(ref_info, qry_info)
    ref = fio.build_msa_from_file(f"{D}/aln.fasta", ref_info, True)
    qry = fio.build_msa_from_file(f"{D}/query.fasta", qry_info, True)
    tree = Tree.from_file(f"{D}/ref.tre")
    return tree, ref, qry


def _from_dict(tree_str, seqs, query):
    tree = Tree.from_string(tree_str)
    ref = fio.MSA()
    for k, v in seqs.items():
        ref.append(k, v)
    qry = fio.MSA(num_sites=ref.num_sites)
    qry.append("q1", query)
    return tree, ref, qry


@pytest.mark.parametrize("desc", [
    "GTR{1.1/2.9/0.8/1.2/3.4/1}+FU{0.27/0.23/0.24/0.26}+G4{0.6}",
    "GTR+G4{0.8}+IU{0.2}",
    "GTR+R3{0.2/1.0/2.4}{0.3/0.4/0.3}",
    "HKY{1/2.5}+FC+G4m{0.5}",
    "GTR+G+ASC_LEWIS",
    "GTR+G+ASC_STAM{120/130/140/110}",
])
def test_dna_roundtrip(tmp_path, desc):
    tree, ref, qry = _dna_data()
    _roundtrip(tmp_path, tree, ref, qry, Model.from_string(desc))


def test_bin_roundtrip(tmp_path):
    tree, ref, qry = _from_dict(BIN_TREE, BIN_SEQS, BIN_QUERY)
    _roundtrip(tmp_path, tree, ref, qry, Model.from_string("BIN+G2{1.2}"))


def test_diploid10_roundtrip(tmp_path):
    tree, ref, qry = _from_dict(GT_TREE, GT_SEQS, GT_QUERY)
    _roundtrip(tmp_path, tree, ref, qry, Model.from_string(
        "GTGTR4{1.5/2.5/0.8/1.2/3.0/1.0}+FE+G4{0.8}"))


def _aa_data():
    from tests.test_mixture import AA_TREE
    ref_info = fio.make_msa_info(f"{D}/AA_aln.fasta")
    qry_info = fio.make_msa_info(f"{D}/AA_query.fasta")
    fio.MSAInfo.or_mask(ref_info, qry_info)
    ref = fio.build_msa_from_file(f"{D}/AA_aln.fasta", ref_info, True)
    qry = fio.build_msa_from_file(f"{D}/AA_query.fasta", qry_info, True)
    return Tree.from_string(AA_TREE), ref, qry


def test_aa_roundtrip(tmp_path):
    tree, ref, qry = _aa_data()
    _roundtrip(tmp_path, tree, ref, qry, Model.from_string("WAG+G4{0.9}"))


def test_mixture_roundtrip(tmp_path):
    from tests.test_mixture import _synthetic_components
    comps = _synthetic_components(3)
    aa_matrices.MIXTURES["RTMIX3M"] = (comps, "gamma")
    try:
        tree, ref, qry = _aa_data()
        model = Model.from_string("RTMIX3M+G3{0.7}")
        eng, eng2 = _roundtrip(tmp_path, tree, ref, qry, model)
        # all three components survived (not just component 0)
        assert eng2.model.submodels is not None
        assert len(eng2.model.submodels) == 3
        for (r1, f1), (r2, f2) in zip(eng.model.submodels,
                                      eng2.model.submodels):
            np.testing.assert_allclose(r1, r2)
            np.testing.assert_allclose(f1, f2)
    finally:
        aa_matrices.MIXTURES.pop("RTMIX3M", None)


def test_old_format_rejected(tmp_path):
    path = str(tmp_path / "old.npz")
    np.savez(path, format_version=np.array(2))
    with pytest.raises(ValueError, match="re-run --dump-binary"):
        load_binary(path)
