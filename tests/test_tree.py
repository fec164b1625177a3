"""Tree layer tests.

The numbered-newick and rooted-mapping expectations are the same goldens the
reference asserts in test/src/pll_util.cpp:134-185 and
test/src/rtree_mapper.cpp, so edge numbering is interchangeable with EPA-ng.
"""

import numpy as np
import pytest

from epa_ng_tpu.tree import Tree, DEFAULT_BRANCH_LENGTH

D = "/root/reference/test/data"


def unit_lengths(tree: Tree) -> Tree:
    tree.edge_lengths = np.ones_like(tree.edge_lengths)
    return tree


def test_parse_basic():
    t = Tree.from_file(f"{D}/ref.tre")
    assert t.n_tips == 8
    assert t.n_edges == 13
    assert t.n_inner == 6
    assert sorted(t.labels) == list("ABCDEFGH")
    assert t.mapper is None


def test_edge_enumeration_unique():
    t = Tree.from_file(f"{D}/ref.tre")
    # every non-vroot node owns exactly one edge
    assert len(set(t.edge_child.tolist())) == t.n_edges
    assert t.node_edge[t.vroot] == -1
    # parents of edges are consistent
    for e in range(t.n_edges):
        assert t.node_parent[t.edge_child[e]] == t.edge_parent[e]


def test_numbered_newick_unrooted():
    t = unit_lengths(Tree.from_file(f"{D}/ref.tre"))
    expected = ("(A:1.00{0},(B:1.00{1},(C:1.00{2},(D:1.00{3},(E:1.00{4},"
                "(F:1.00{5},G:1.00{6}):1.00{7}):1.00{8}):1.00{9}):1.00{10})"
                ":1.00{11},H:1.00{12});")
    assert t.numbered_newick(precision=2) == expected


def test_numbered_newick_innerlabels():
    t = unit_lengths(Tree.from_file(f"{D}/ref_innerlabels.tre"))
    expected = ("(A:1.00{0},(B:1.00{1},(C:1.00{2},(D:1.00{3},(E:1.00{4},"
                "(F:1.00{5},G:1.00{6})FG:1.00{7})EFG:1.00{8})DEFG:1.00{9})"
                "CDEFG:1.00{10})BCDEFG:1.00{11},H:1.00{12})ABCDEFGH;")
    assert t.numbered_newick(precision=2) == expected


ROOTED_EXPECTED = {
    "ref_rooted.tre":
        "((((G:1.01{0},H:1.08{1}):0.01{2},A:1.34{3}):1.00{4},B:1.66{5})"
        ":1.01{6},(C:1.08{7},D:1.26{8}):1.12{9});",
    "ref_rooted_2.tre":
        "(A:1.34{0},((B:1.66{1},(C:1.08{2},D:1.26{3}):1.12{4}):1.00{5},"
        "(G:1.01{6},H:1.08{7}):1.90{8}):0.01{9});",
    "ref_rooted_3.tre":
        "(((A:1.34{0},(B:1.66{1},(C:1.08{2},D:1.26{3}):1.12{4}):1.00{5})"
        ":1.01{6},G:1.08{7}):1.90{8},H:0.01{9});",
    "ref_rooted_innerlabels.tre":
        "((((G:1.01{0},H:1.08{1})GH:0.01{2},A:1.34{3})GHA:1.00{4},B:1.66{5})"
        "GHAB:1.01{6},(C:1.08{7},D:1.26{8})CD:1.12{9})GHABCD;",
    "ref_rooted_2_innerlabels.tre":
        "(A:1.34{0},((B:1.66{1},(C:1.08{2},D:1.26{3})CD:1.12{4})BCD:1.00{5},"
        "(G:1.01{6},H:1.08{7})GH:1.90{8})BCDGH:0.01{9})ABCDGH;",
    "ref_rooted_3_innerlabels.tre":
        "(((A:1.34{0},(B:1.66{1},(C:1.08{2},D:1.26{3})CD:1.12{4})BCD:1.00{5})"
        "ABCD:1.01{6},G:1.08{7})ABCDG:1.90{8},H:0.01{9})ABCDGH;",
}


@pytest.mark.parametrize("fname", sorted(ROOTED_EXPECTED))
def test_numbered_newick_rooted(fname):
    t = Tree.from_file(f"{D}/{fname}")
    assert t.mapper is not None
    assert t.numbered_newick(precision=2) == ROOTED_EXPECTED[fname]


# (utree placement -> rooted placement) goldens from test/src/rtree_mapper.cpp
MAPPING_CASES = [
    ("ref_rooted.tre",
     [(8, 1.0), (8, 1.5), (6, 0.5), (7, 0.001)],
     [(9, 1.0), (6, 0.63), (7, 0.5), (8, 0.001)]),
    ("ref_rooted_2.tre",
     [(0, 1.34), (0, 1.345), (8, 0.5), (2, 0.001)],
     [(0, 1.34), (9, 0.005), (8, 0.5), (2, 0.001)]),
    ("ref_rooted_3.tre",
     [(8, 0.5), (8, 0.005), (0, 0.5), (2, 0.001)],
     [(8, 1.41), (9, 0.005), (0, 0.5), (2, 0.001)]),
]


@pytest.mark.parametrize("fname,utree,rtree", MAPPING_CASES)
def test_rtree_mapping(fname, utree, rtree):
    t = Tree.from_file(f"{D}/{fname}")
    for (u_edge, u_distal), (r_edge, r_distal) in zip(utree, rtree):
        edge, distal = t.mapper.in_rtree(u_edge, u_distal)
        assert edge == r_edge
        assert distal == pytest.approx(r_distal, abs=1e-10)


def test_sum_branch_lengths_all_one():
    t = unit_lengths(Tree.from_file(f"{D}/ref.tre"))
    assert t.total_branch_length() == t.n_edges


def test_missing_branch_lengths_defaulted():
    t = Tree.from_string("((A,B),(C,D),E);")
    assert np.allclose(t.edge_lengths, DEFAULT_BRANCH_LENGTH)


def test_multifurcation_rejected():
    with pytest.raises(Exception, match="multifurcation"):
        Tree.from_string("((A,B,C,X),(C,D),E);")


def test_too_small_rejected():
    with pytest.raises(Exception):
        Tree.from_string("(A,B);")
