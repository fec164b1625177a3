"""Reference-tree topology: newick parsing, unrooting, edge enumeration.

The tree is held as flat arrays in a "rooted at the virtual root" view: the
virtual root (an inner node) has three children, every other inner node has
two. Edges are enumerated in postorder over the virtual root's child subtrees
in input order — the same order the reference produces with its recursive
branch query (reference: src/core/pll/pll_util.cpp:182-205), so jplace
``edge_num`` values are interchangeable.

Rooted input trees are unrooted on the fly; an :class:`RtreeMapper` records how
unrooted edge numbers (and distal lengths on the former root edge) translate
back to the rooted numbering for output (reference:
src/io/file_io.cpp:44-192, src/core/pll/rtree_mapper.hpp).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

# Branch length used where the input tree has none (or zero); the reference
# treats zero-length branches as missing too (src/core/pll/pll_util.cpp:13-39,
# src/util/constants.hpp DEFAULT_BRANCH_LENGTH = -log(0.9)).
DEFAULT_BRANCH_LENGTH = -math.log(0.9)


class NewickError(ValueError):
    pass


@dataclass
class _PNode:
    label: Optional[str] = None
    length: Optional[float] = None
    children: list = field(default_factory=list)

    @property
    def is_leaf(self) -> bool:
        return not self.children


def _tokenize_label(s: str, i: int) -> tuple[str, int]:
    """Read a (possibly quoted) label starting at position i."""
    if i < len(s) and s[i] == "'":
        j = i + 1
        out = []
        while j < len(s):
            if s[j] == "'":
                if j + 1 < len(s) and s[j + 1] == "'":
                    out.append("'")
                    j += 2
                    continue
                return "".join(out), j + 1
            out.append(s[j])
            j += 1
        raise NewickError("unterminated quoted label")
    j = i
    while j < len(s) and s[j] not in "(),:;[":
        j += 1
    return s[i:j].strip(), j


def parse_newick(text: str) -> _PNode:
    """Parse one newick tree string into a nested node structure."""
    s = text.strip()
    if not s:
        raise NewickError("empty newick string")
    pos = [0]

    def skip_ws():
        while pos[0] < len(s) and (s[pos[0]].isspace() or s[pos[0]] == "["):
            if s[pos[0]] == "[":  # comment
                j = s.find("]", pos[0])
                if j < 0:
                    raise NewickError("unterminated comment")
                pos[0] = j + 1
            else:
                pos[0] += 1

    def parse_node() -> _PNode:
        node = _PNode()
        skip_ws()
        if pos[0] < len(s) and s[pos[0]] == "(":
            pos[0] += 1
            node.children.append(parse_node())
            skip_ws()
            while pos[0] < len(s) and s[pos[0]] == ",":
                pos[0] += 1
                node.children.append(parse_node())
                skip_ws()
            if pos[0] >= len(s) or s[pos[0]] != ")":
                raise NewickError("unbalanced parentheses")
            pos[0] += 1
        skip_ws()
        if pos[0] < len(s) and s[pos[0]] not in "(),:;[":
            label, j = _tokenize_label(s, pos[0])
            node.label = label or None
            pos[0] = j
        skip_ws()
        if pos[0] < len(s) and s[pos[0]] == ":":
            length_str, j = _tokenize_label(s, pos[0] + 1)
            try:
                node.length = float(length_str)
            except ValueError as e:
                raise NewickError(f"bad branch length {length_str!r}") from e
            pos[0] = j
        return node

    root = parse_node()
    skip_ws()
    if pos[0] < len(s) and s[pos[0]] == ";":
        pos[0] += 1
    skip_ws()
    if pos[0] < len(s):
        raise NewickError(f"trailing characters after tree: {s[pos[0]:][:20]!r}")
    return root


class RtreeMapper:
    """Maps unrooted edge numbers/distal lengths to rooted-tree equivalents.

    Mirrors the reference's rtree_mapper (src/core/pll/rtree_mapper.hpp):
    placements on the former root edge split onto the proximal/distal rooted
    edges with distal-length carryover arithmetic.
    """

    def __init__(self, utree_root_edge: int, rtree_proximal_edge: int,
                 rtree_distal_edge: int, proximal_length: float,
                 distal_length: float, left: bool,
                 mapping: list[int], root_label: str = ""):
        self.utree_root_edge = utree_root_edge
        self.rtree_proximal_edge = rtree_proximal_edge
        self.rtree_distal_edge = rtree_distal_edge
        self.proximal_length = proximal_length
        self.distal_length = distal_length
        self.left = left
        self.mapping = mapping
        self.root_label = root_label

    def __bool__(self) -> bool:
        return bool(self.mapping)

    def in_rtree(self, branch_id: int, distal_length: float) -> tuple[int, float]:
        if branch_id == self.utree_root_edge:
            if distal_length > self.distal_length:
                carryover = distal_length - self.distal_length
                return self.rtree_proximal_edge, self.proximal_length - carryover
            return self.rtree_distal_edge, distal_length
        return self.mapping[branch_id], distal_length

    def in_rtree_batch(self, edges: np.ndarray,
                       distals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized :meth:`in_rtree` over flat placement arrays."""
        e = np.asarray(edges, dtype=np.int64)
        out_e = np.asarray(self.mapping, dtype=np.int64)[e]
        out_d = np.asarray(distals, dtype=np.float64).copy()
        root = e == self.utree_root_edge
        if root.any():
            over = root & (out_d > self.distal_length)
            out_e[root] = self.rtree_distal_edge
            out_e[over] = self.rtree_proximal_edge
            out_d[over] = self.proximal_length - (out_d[over]
                                                  - self.distal_length)
        return out_e, out_d

    def map_at(self, i: int) -> int:
        if i == self.utree_root_edge:
            raise ValueError(f"edge {i} is the root edge; handle separately")
        return self.mapping[i]


class Tree:
    """An unrooted binary reference tree with enumerated edges."""

    def __init__(self):
        self.n_tips: int = 0
        self.n_nodes: int = 0
        self.labels: list[str] = []          # tip labels, by tip node id
        self.node_label: list[Optional[str]] = []
        self.node_children: list[list[int]] = []
        self.node_parent: np.ndarray = None  # [nodes], vroot -> -1
        self.node_edge: np.ndarray = None    # edge above node, vroot -> -1
        self.edge_child: np.ndarray = None   # [edges]
        self.edge_parent: np.ndarray = None  # [edges]
        self.edge_lengths: np.ndarray = None  # [edges] float64
        self.vroot: int = -1
        self.mapper: Optional[RtreeMapper] = None

    # -- construction ------------------------------------------------------

    @classmethod
    def from_file(cls, path: str, preserve_rooting: bool = True) -> "Tree":
        with open(path) as f:
            return cls.from_string(f.read(), preserve_rooting)

    @classmethod
    def from_string(cls, newick: str, preserve_rooting: bool = True) -> "Tree":
        top = parse_newick(newick)
        mapper = None
        if len(top.children) == 2:
            top, mapper = cls._unroot(top, preserve_rooting)
        elif len(top.children) != 3:
            raise NewickError(
                "Input tree contains multifurcations (polytomies) at the root!"
                if len(top.children) > 3 else "Number of tip nodes too small")
        tree = cls()
        tree._build(top)
        tree.mapper = mapper
        return tree

    @staticmethod
    def _unroot(root: _PNode, preserve_rooting: bool):
        """Unroot a rooted binary tree; mirrors pll_rtree_unroot + EPA-ng's
        vroot correction and mapper build (src/io/file_io.cpp:120-167)."""
        left_child, right_child = root.children
        left = not left_child.is_leaf
        l_len = left_child.length or DEFAULT_BRANCH_LENGTH
        r_len = right_child.length or DEFAULT_BRANCH_LENGTH
        merged = l_len + r_len

        if left:
            # vroot = left child; its subtrees first, then the right subtree
            vroot = _PNode(label=left_child.label, length=None)
            vroot.children = list(left_child.children)
            right_child.length = merged
            vroot.children.append(right_child)
            distal_length, proximal_length = r_len, l_len
        else:
            if right_child.is_leaf:
                raise NewickError("Number of tip nodes too small")
            vroot = _PNode(label=right_child.label, length=None)
            left_child.length = merged
            vroot.children = [left_child] + list(right_child.children)
            distal_length, proximal_length = l_len, r_len

        mapper = None
        if preserve_rooting:
            mapping: list[int] = []
            counter = [0]

            def recurse(n: _PNode):
                for ch in n.children:
                    recurse(ch)
                mapping.append(counter[0])
                counter[0] += 1

            if left:
                recurse(vroot.children[0])
                recurse(vroot.children[1])
                rtree_proximal = counter[0]
                counter[0] += 1
                recurse(vroot.children[2])
                rtree_distal = mapping[-1]
                utree_root_edge = len(mapping) - 1
            else:
                rtree_distal = 0
                utree_root_edge = 0
                recurse(vroot.children[0])  # the tip: rooted id 0
                for ch in vroot.children[1:]:
                    recurse(ch)
                mapping.append(counter[0])  # vroot itself
                rtree_proximal = mapping.pop()
            mapper = RtreeMapper(utree_root_edge, rtree_proximal, rtree_distal,
                                 proximal_length, distal_length, left, mapping,
                                 root_label=root.label or "")
        return vroot, mapper

    def _build(self, top: _PNode):
        # validate binary-ness and count tips
        def check(n: _PNode, is_top: bool):
            want = 3 if is_top else 2
            if n.children and len(n.children) != want:
                raise NewickError(
                    "Input Tree contains multifurcations (polytomies)!")
            for ch in n.children:
                check(ch, False)
        check(top, True)

        tips: list[_PNode] = []
        inners: list[_PNode] = []

        def collect(n: _PNode):
            if n.is_leaf:
                tips.append(n)
            else:
                for ch in n.children:
                    collect(ch)
                inners.append(n)
        collect(top)

        if len(tips) < 3:
            raise NewickError("Number of tip nodes too small")

        n_tips = len(tips)
        ids: dict[int, int] = {}
        for i, n in enumerate(tips):
            ids[id(n)] = i
        for i, n in enumerate(inners):
            ids[id(n)] = n_tips + i

        n_nodes = n_tips + len(inners)
        self.n_tips = n_tips
        self.n_nodes = n_nodes
        self.labels = [n.label or "" for n in tips]
        self.node_label = [None] * n_nodes
        self.node_children = [[] for _ in range(n_nodes)]
        parent = np.full(n_nodes, -1, dtype=np.int32)
        node_edge = np.full(n_nodes, -1, dtype=np.int32)

        edge_child: list[int] = []
        edge_parent: list[int] = []
        edge_lengths: list[float] = []

        def wire(n: _PNode):
            nid = ids[id(n)]
            self.node_label[nid] = n.label
            for ch in n.children:
                cid = ids[id(ch)]
                wire(ch)
                self.node_children[nid].append(cid)
                parent[cid] = nid
            return nid

        self.vroot = wire(top)

        def enumerate_edges(n: _PNode):
            nid = ids[id(n)]
            for ch in n.children:
                enumerate_edges(ch)
            eid = len(edge_child)
            edge_child.append(nid)
            edge_parent.append(parent[nid])
            length = n.length
            if not length:  # missing or zero, like the reference
                length = DEFAULT_BRANCH_LENGTH
            edge_lengths.append(length)
            node_edge[nid] = eid

        for ch in top.children:
            enumerate_edges(ch)

        self.node_parent = parent
        self.node_edge = node_edge
        self.edge_child = np.asarray(edge_child, dtype=np.int32)
        self.edge_parent = np.asarray(edge_parent, dtype=np.int32)
        self.edge_lengths = np.asarray(edge_lengths, dtype=np.float64)

    # -- derived -----------------------------------------------------------

    @property
    def n_edges(self) -> int:
        return len(self.edge_child)

    @property
    def n_inner(self) -> int:
        return self.n_nodes - self.n_tips

    def edge_is_tip(self) -> np.ndarray:
        return self.edge_child < self.n_tips

    def total_branch_length(self) -> float:
        return float(self.edge_lengths.sum())

    # -- output ------------------------------------------------------------

    def plain_newick(self, precision: int = 10) -> str:
        """Plain unrooted newick (no edge-number annotations) — e.g. for
        writing synthetic benchmark inputs back to disk."""
        fmt = f"{{:.{precision}f}}"

        def rec(nid: int) -> str:
            if self.node_children[nid]:
                inner = ",".join(rec(c) for c in self.node_children[nid])
                lbl = self.node_label[nid] or ""
                return (f"({inner}){lbl}"
                        f":{fmt.format(float(self.edge_lengths[self.node_edge[nid]]))}")
            return (f"{self.node_label[nid] or ''}"
                    f":{fmt.format(float(self.edge_lengths[self.node_edge[nid]]))}")

        kids = self.node_children[self.vroot]
        inner = ",".join(rec(c) for c in kids)
        lbl = self.node_label[self.vroot] or ""
        return f"({inner}){lbl};"

    def numbered_newick(self, precision: int = 10) -> str:
        """Newick with {edge_num} annotations, matching the reference's
        formatting (fixed-point lengths; rooted simulation when a mapper is
        present; reference: src/core/pll/pll_util.cpp:207-352)."""
        fmt = f"{{:.{precision}f}}"
        counter = [0]
        mapper = self.mapper

        def edge_len(nid: int) -> float:
            return float(self.edge_lengths[self.node_edge[nid]])

        def rec(nid: int, parts: list):
            if self.node_children[nid]:
                parts.append("(")
                rec(self.node_children[nid][0], parts)
                parts.append(",")
                rec(self.node_children[nid][1], parts)
                eid = mapper.map_at(counter[0]) if mapper else counter[0]
                parts.append(")")
                if self.node_label[nid]:
                    parts.append(self.node_label[nid])
                parts.append(f":{fmt.format(edge_len(nid))}{{{eid}}}")
            else:
                eid = mapper.map_at(counter[0]) if mapper else counter[0]
                parts.append(
                    f"{self.node_label[nid] or ''}:{fmt.format(edge_len(nid))}{{{eid}}}")
            counter[0] += 1

        parts: list = []
        kids = self.node_children[self.vroot]
        if not mapper:
            parts.append("(")
            rec(kids[0], parts)
            parts.append(",")
            rec(kids[1], parts)
            parts.append(",")
            rec(kids[2], parts)
            parts.append(")")
            if self.node_label[self.vroot]:
                parts.append(self.node_label[self.vroot])
            parts.append(";")
        else:
            parts.append("(")
            if mapper.left:
                parts.append("(")
                rec(kids[0], parts)
                parts.append(",")
                rec(kids[1], parts)
                parts.append(")")
                if self.node_label[self.vroot]:
                    parts.append(self.node_label[self.vroot])
                eid = mapper.rtree_proximal_edge
                parts.append(f":{fmt.format(mapper.proximal_length)}{{{eid}}}")
                parts.append(",")
                right = kids[2]
                if not self.node_children[right]:
                    eid = mapper.rtree_distal_edge
                    parts.append(
                        f"{self.node_label[right] or ''}:"
                        f"{fmt.format(mapper.distal_length)}{{{eid}}}")
                else:
                    parts.append("(")
                    rec(self.node_children[right][0], parts)
                    parts.append(",")
                    rec(self.node_children[right][1], parts)
                    parts.append(")")
                    if self.node_label[right]:
                        parts.append(self.node_label[right])
                    eid = mapper.rtree_distal_edge
                    parts.append(f":{fmt.format(mapper.distal_length)}{{{eid}}}")
            else:
                left = kids[0]
                assert not self.node_children[left]
                eid = mapper.rtree_distal_edge
                parts.append(
                    f"{self.node_label[left] or ''}:"
                    f"{fmt.format(mapper.distal_length)}{{{eid}}}")
                counter[0] += 1
                parts.append(",(")
                rec(kids[1], parts)
                parts.append(",")
                rec(kids[2], parts)
                parts.append(")")
                if self.node_label[self.vroot]:
                    parts.append(self.node_label[self.vroot])
                eid = mapper.rtree_proximal_edge
                parts.append(f":{fmt.format(mapper.proximal_length)}{{{eid}}}")
            parts.append(")")
            if mapper.root_label:
                parts.append(mapper.root_label)
            parts.append(";")
        return "".join(parts)
