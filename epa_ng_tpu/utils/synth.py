"""Synthetic benchmark data: random trees, reference alignments, queries.

Used by bench.py, __graft_entry__ and the multi-chip dryrun (the neotrop
benchmark tarball is not available in this environment)."""

from __future__ import annotations

import numpy as np

from epa_ng_tpu.io.fasta import MSA
from epa_ng_tpu.tree import Tree

DNA = "ACGT"
AA = "ARNDCQEGHILKMFPSTWYV"


def random_tree(n_taxa: int, seed: int = 0) -> Tree:
    """Random binary unrooted tree via sequential random attachment."""
    rng = np.random.default_rng(seed)

    class N:
        __slots__ = ("label", "length", "children")

        def __init__(self, label=None, length=None):
            self.label = label
            self.length = length
            self.children = []

    def bl():
        return float(rng.gamma(1.5, 0.08) + 1e-3)

    root = N()
    root.children = [N(f"T{i}", bl()) for i in range(3)]
    leaves = list(root.children)
    parents = {id(c): root for c in root.children}
    for i in range(3, n_taxa):
        target = leaves[rng.integers(len(leaves))]
        parent = parents[id(target)]
        mid = N(None, target.length)
        newleaf = N(f"T{i}", bl())
        target.length = bl()
        mid.children = [target, newleaf]
        parent.children[parent.children.index(target)] = mid
        parents[id(mid)] = parent
        parents[id(target)] = mid
        parents[id(newleaf)] = mid
        leaves.append(newleaf)

    def to_newick(n):
        if not n.children:
            return f"{n.label}:{n.length:.6f}"
        inner = ",".join(to_newick(c) for c in n.children)
        if n.length is None:
            return f"({inner})"
        return f"({inner}):{n.length:.6f}"

    return Tree.from_string(to_newick(root) + ";")


def random_msa(labels, sites: int, seed: int = 1, alphabet: str = DNA,
               n_patterns: int | None = None) -> MSA:
    """``n_patterns``: draw only that many distinct columns and tile them
    to ``sites`` — a pattern-heavy alignment like real (conserved) data,
    for exercising site-pattern compression. None keeps the original
    fully-random generator (and its exact RNG stream)."""
    rng = np.random.default_rng(seed)
    K = len(alphabet)
    if n_patterns is not None:
        cols = n_patterns
        base = rng.integers(0, K, size=cols)
        mat = np.empty((len(labels), cols), dtype=np.int64)
        for i in range(len(labels)):
            mut = rng.random(cols) < 0.25
            mat[i] = np.where(mut, rng.integers(0, K, size=cols), base)
        tile = rng.integers(0, cols, size=sites)
        mat = mat[:, tile]
        msa = MSA()
        lut = np.frombuffer("".join(alphabet).encode(), dtype=np.uint8)
        for i, label in enumerate(labels):
            msa.append(label, lut[mat[i]].tobytes().decode())
        return msa
    base = rng.integers(0, K, size=sites)
    msa = MSA()
    for i, label in enumerate(labels):
        mut = rng.random(sites) < 0.25
        seq = np.where(mut, rng.integers(0, K, size=sites), base)
        msa.append(label, "".join(alphabet[c] for c in seq))
    return msa


def random_queries(n: int, sites: int, seed: int = 2,
                   read_frac: float = 0.5, alphabet: str = DNA) -> MSA:
    """Short-read-style queries: a random core region, gaps outside."""
    rng = np.random.default_rng(seed)
    K = len(alphabet)
    msa = MSA()
    for i in range(n):
        read_len = max(8, int(sites * read_frac))
        start = int(rng.integers(0, max(1, sites - read_len)))
        seq = ["-"] * sites
        for j in range(start, min(start + read_len, sites)):
            seq[j] = alphabet[rng.integers(0, K)]
        msa.append(f"Q{i}", "".join(seq))
    return msa


def synth_dataset(n_taxa=64, sites=400, n_queries=256, seed=0,
                  alphabet: str = DNA, n_patterns: int | None = None):
    tree = random_tree(n_taxa, seed)
    ref = random_msa(tree.labels, sites, seed + 1, alphabet,
                     n_patterns=n_patterns)
    qry = random_queries(n_queries, sites, seed + 2, alphabet=alphabet)
    return tree, ref, qry


def write_fasta(msa: MSA, path: str):
    with open(path, "w") as f:
        for s in msa:
            f.write(f">{s.header}\n{s.sequence}\n")


def synth_files(outdir: str, n_taxa=64, sites=400, n_queries=256, seed=0):
    """Write tree.nwk / ref.fasta / query.fasta for end-to-end (file ->
    jplace) runs; returns their paths."""
    import os
    tree, ref, qry = synth_dataset(n_taxa, sites, n_queries, seed)
    tpath = os.path.join(outdir, "tree.nwk")
    rpath = os.path.join(outdir, "ref.fasta")
    qpath = os.path.join(outdir, "query.fasta")
    with open(tpath, "w") as f:
        f.write(tree.plain_newick() + "\n")
    write_fasta(ref, rpath)
    write_fasta(qry, qpath)
    return tpath, rpath, qpath
