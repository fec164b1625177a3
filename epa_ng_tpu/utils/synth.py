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


def evolved_dataset(n_taxa=64, sites=400, n_queries=256, seed=0,
                    model_str: str | None = None, read_frac: float = 0.5,
                    pendant: float = 0.05, alphabet: str = DNA):
    """Model-evolved synthetic data: the reference alignment is SIMULATED
    along the tree under the given substitution model (root states from the
    stationary frequencies, every branch applies P(t) per site with
    Gamma-rate heterogeneity), and each query is evolved from a sampled
    attachment point on a known edge, then cut to a read-length window.

    Unlike :func:`synth_dataset`'s uniform-random sequences (whose
    placement posteriors are tie-dominated — every edge explains noise
    equally badly), evolved queries have peaked posteriors like real
    metagenomic reads, so heuristic-accuracy numbers measured on them are
    meaningful (the reference's accuracy claim:
    /root/reference/README.md:179-180).

    Returns ``(tree, ref_msa, query_msa, true_edges)`` where
    ``true_edges[q]`` is the edge index (the engine/jplace ``edge_num``
    space) the query was generated from.
    """
    from epa_ng_tpu.models import Model
    from epa_ng_tpu.ops import eigen as eigen_mod

    if model_str is None:
        model_str = ("GTR{1.1/2.9/0.8/1.2/3.4/1}"
                     "+FU{0.27/0.23/0.24/0.26}+G4{0.6}")
    tree = random_tree(n_taxa, seed)
    model = Model.from_string(model_str)
    if model.pinv:
        raise ValueError("evolved_dataset supports pinv == 0 models only")
    eig = eigen_mod.decompose(model)
    if eig.mixture:
        raise ValueError("evolved_dataset supports single-matrix models")
    rng = np.random.default_rng(seed + 101)
    K = eig.num_states
    if K != len(alphabet):
        raise ValueError("alphabet size does not match the model")

    # per-site rate category (fixed for the whole simulation, like the
    # standard phylogenetic simulators: a site's rate persists down the tree)
    w = np.asarray(eig.weights) / np.sum(eig.weights)
    site_rate = np.asarray(eig.rates)[rng.choice(len(w), size=sites, p=w)]
    ev, A, Ainv = eig.eigenvals, eig.A, eig.Ainv

    def evolve(states: np.ndarray, t: float) -> np.ndarray:
        """Evolve per-site states through P(t * site_rate)."""
        expd = np.exp(ev[None, :] * (t * site_rate)[:, None])     # [S,K]
        P = np.einsum("ik,sk,kj->sij", A, expd, Ainv)             # [S,K,K]
        rows = np.maximum(P[np.arange(sites), states], 0.0)
        rows /= rows.sum(axis=1, keepdims=True)
        u = rng.random(sites)[:, None]
        return (u >= rows.cumsum(axis=1)).sum(axis=1)

    # simulate states at every node, root -> leaves (GTR is reversible, so
    # rooting the simulation at the virtual root is statistically exact)
    states = np.empty((tree.n_nodes, sites), dtype=np.int64)
    freqs = np.asarray(eig.freqs)
    u0 = rng.random(sites)[:, None]
    states[tree.vroot] = (u0 >= freqs.cumsum()[None, :]).sum(axis=1)
    stack = [tree.vroot]
    while stack:
        nid = stack.pop()
        for ch in tree.node_children[nid]:
            t = float(tree.edge_lengths[tree.node_edge[ch]])
            states[ch] = evolve(states[nid], t)
            stack.append(ch)

    lut = np.frombuffer(alphabet.encode(), dtype=np.uint8)
    ref = MSA()
    for i, label in enumerate(tree.labels):
        ref.append(label, lut[states[i]].tobytes().decode())

    # queries: sample an edge, an attachment fraction along it, evolve the
    # child-end states up to the attachment point and out the pendant
    # branch, then keep only a read-length window
    true_edges = rng.integers(0, tree.n_edges, size=n_queries)
    qry = MSA()
    read_len = max(8, int(sites * read_frac))
    for qi in range(n_queries):
        e = int(true_edges[qi])
        frac = float(rng.random())
        attach = evolve(states[tree.edge_child[e]],
                        frac * float(tree.edge_lengths[e]))
        qstate = evolve(attach, pendant)
        start = int(rng.integers(0, max(1, sites - read_len)))
        seq = np.full(sites, ord("-"), dtype=np.uint8)
        end = min(start + read_len, sites)
        seq[start:end] = lut[qstate[start:end]]
        qry.append(f"Q{qi}", seq.tobytes().decode())
    return tree, ref, qry, true_edges


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
