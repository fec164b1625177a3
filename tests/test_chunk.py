"""Tests for the matrix-native chunk path: vectorized encode, duplicate
collapse, device-side output filtering, batch jplace writing."""

import json

import numpy as np
import pytest

from epa_ng_tpu.core import chunk as chunk_mod
from epa_ng_tpu.io.fasta import MSA
from epa_ng_tpu.models.charmaps import encode_lookup_cols, encode_states
from epa_ng_tpu.utils.ranges import get_valid_range


def _msa(seqs):
    m = MSA()
    for i, s in enumerate(seqs):
        m.append(f"s{i}", s)
    return m


def test_encode_rows_matches_scalar_encoders():
    seqs = ["ACGT-N?RY.", "--acgtUuXx", "NNNNNNNNNN"]
    msa = _msa(seqs)
    ec = chunk_mod.from_msa(msa, 4)
    for i, s in enumerate(seqs):
        np.testing.assert_array_equal(ec.codes[i], encode_lookup_cols(s, 4))
        np.testing.assert_array_equal(
            chunk_mod.col_state_masks(4)[ec.codes[i]], encode_states(s, 4))
        assert tuple(ec.ranges[i]) == get_valid_range(s)


def test_col_state_masks_exact_for_all_accepted_chars():
    """Every character that encodes onto a lookup column must have exactly
    that column's state mask (the exactness argument for deriving qmasks
    from codes)."""
    from epa_ng_tpu.models.charmaps import (INVALID_COL, lookup_col_table,
                                            state_mask_table)
    for k in (4, 20, 2, 10):
        cols = lookup_col_table(k)
        masks = state_mask_table(k)
        colmask = chunk_mod.col_state_masks(k)
        for ch in range(256):
            if cols[ch] != INVALID_COL and masks[ch] != 0:
                assert colmask[cols[ch]] == masks[ch], (k, chr(ch))


def test_encode_invalid_char_raises():
    with pytest.raises(ValueError, match="invalid character"):
        chunk_mod.from_msa(_msa(["ACG!"]), 4)


def test_collapse_merges_duplicates_keeps_order():
    msa = _msa(["AAAA", "CCCC", "AAAA", "GGGG", "CCCC"])
    ec = chunk_mod.collapse(chunk_mod.from_msa(msa, 4))
    assert len(ec) == 3
    assert ec.headers == [["s0", "s2"], ["s1", "s4"], ["s3"]]
    np.testing.assert_array_equal(
        ec.codes, chunk_mod.from_msa(_msa(["AAAA", "CCCC", "GGGG"]), 4).codes)


def test_collapse_distinguishes_ranges():
    # '?' and '-' share the gap lookup column but give different valid
    # ranges -> must NOT collapse
    msa = _msa(["?ACG", "-ACG"])
    ec = chunk_mod.collapse(chunk_mod.from_msa(msa, 4))
    assert len(ec) == 2


def test_collapse_merges_t_and_u():
    # U normalizes onto the T column with the same state mask: placement
    # is identical, so collapsing is correct (and a superset of the
    # reference's raw-string collapse)
    msa = _msa(["ACGT", "ACGU"])
    ec = chunk_mod.collapse(chunk_mod.from_msa(msa, 4))
    assert len(ec) == 1
    assert ec.headers == [["s0", "s1"]]


def test_jplace_escaping(tmp_path):
    from epa_ng_tpu.core.lwr import ChunkPlacements
    from epa_ng_tpu.io.jplace import JplaceWriter
    cp = ChunkPlacements(
        headers=[['he said "hi"\\', "plain"]],
        counts=np.array([1], np.int32),
        edges=np.array([0]), logls=np.array([-1.0]),
        lwrs=np.array([1.0]), pendants=np.array([0.1]),
        distals=np.array([0.05]))
    w = JplaceWriter(str(tmp_path), "x.jplace", 'tr"ee;', 'inv "quoted"')
    w.write(cp)
    w.close()
    doc = json.loads(open(tmp_path / "x.jplace").read())
    assert doc["tree"] == 'tr"ee;'
    assert doc["metadata"]["invocation"] == 'inv "quoted"'
    assert doc["placements"][0]["n"] == ['he said "hi"\\', "plain"]


def test_in_rtree_batch_matches_scalar(data_dir):
    from epa_ng_tpu.tree import Tree
    tree = Tree.from_file(f"{data_dir}/ref_rooted.tre")
    mapper = tree.mapper
    assert mapper
    rng = np.random.default_rng(0)
    edges = rng.integers(0, tree.n_edges, size=200)
    distals = rng.random(200) * 0.4
    be, bd = mapper.in_rtree_batch(edges, distals)
    for i in range(len(edges)):
        e, d = mapper.in_rtree(int(edges[i]), float(distals[i]))
        assert be[i] == e
        assert bd[i] == pytest.approx(d)


@pytest.mark.parametrize("acc", [False, True])
def test_device_filter_matches_host_filter(acc):
    """The fused path's on-device sort+filter must agree with the host
    filter_pqueries on the exact path (cross-path equality, the reference's
    test style)."""
    from epa_ng_tpu.core.engine import PlacementEngine
    from epa_ng_tpu.models import Model
    from epa_ng_tpu.utils.options import Options
    from epa_ng_tpu.utils.synth import synth_dataset

    tree, ref, qry = synth_dataset(n_taxa=24, sites=160, n_queries=24, seed=5)
    model = Model.from_string("GTR+G")
    opts = Options(acc_threshold=acc,
                   support_threshold=0.95 if acc else 0.02,
                   filter_min=2, filter_max=4)
    eng = PlacementEngine(tree, ref, model, opts)
    fused = eng.place_chunk(qry)

    ec = eng.encode_msa(qry)
    exact = eng._place_chunk_exact(ec, 0)
    for a, b in zip(fused, exact):
        np.testing.assert_array_equal(a.edge_nums, b.edge_nums)
        np.testing.assert_allclose(a.logls, b.logls, atol=1e-6)
        np.testing.assert_allclose(a.lwrs, b.lwrs, atol=1e-6)
        np.testing.assert_allclose(a.distal_lengths, b.distal_lengths,
                                   atol=1e-6)
