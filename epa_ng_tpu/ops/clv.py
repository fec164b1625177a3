"""Conditional likelihood vectors (CLVs) for every edge of the reference tree.

Replaces libpll's partial-traversal machinery (reference:
src/core/pll/epa_pll_util.cpp:62-107 ``precompute_clvs`` +
src/core/pll/pll_util.cpp:80-103 per-direction CLV indices) with a two-pass
formulation:

- **up pass** (postorder): D[n -> parent] for every non-root node,
- **down pass** (preorder): D[parent -> n] for every node,

where D[a -> b] is the conditional likelihood at ``a`` of everything behind
``a`` seen from ``b``. Both passes are a single ``lax.scan`` over a static
operations list; each op contracts two child CLVs with their edge transition
matrices. Numerical underflow is handled by per-site renormalization with a
log-scale accumulator (replacing libpll scaler buffers).

Every edge then has its two directional CLVs as gathers from the buffer:
``U[e] = D[parent(e) -> child(e)]`` (rest-of-tree) and
``V[e] = D[child(e) -> parent(e)]`` (subtree below the edge).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# TPU matmuls downcast f32 operands to bf16 by default; the chained CLV
# contractions need full f32 precision (bf16 error compounds across ~tree
# depth products and corrupts logls on large trees).
_PP = jax.lax.Precision.HIGHEST

from epa_ng_tpu.models.charmaps import encode_states, mask_to_clv_rows
from epa_ng_tpu.ops.eigen import EigenModel, pmatrices
from epa_ng_tpu.tree.tree import Tree


@dataclass
class TreeOps:
    """Static CLV schedule + edge -> directed-CLV index maps."""
    n_tips: int
    n_clvs: int
    ops: np.ndarray      # [n_ops, 5] int32: out, in1, edge1, in2, edge2
    u_idx: np.ndarray    # [E] proximal-direction CLV index per edge
    v_idx: np.ndarray    # [E] distal-direction CLV index per edge


def build_tree_ops(tree: Tree) -> TreeOps:
    T = tree.n_tips
    vroot = tree.vroot

    def didx(n: int, toward: int) -> int:
        """Directed CLV index for D[n -> toward]."""
        if n < T:
            return n  # tips have a single (up) CLV
        neighbors = ([] if n == vroot else [int(tree.node_parent[n])])
        neighbors += tree.node_children[n]
        d = neighbors.index(toward)
        return T + 3 * (n - T) + d

    up_ops = []

    def up(n: int):
        for c in tree.node_children[n]:
            up(c)
        if n == vroot or n < T:
            return
        c0, c1 = tree.node_children[n]
        up_ops.append((didx(n, int(tree.node_parent[n])),
                       didx(c0, n), int(tree.node_edge[c0]),
                       didx(c1, n), int(tree.node_edge[c1])))

    for c in tree.node_children[vroot]:
        up(c)

    down_ops = []

    def down(n: int):
        # D[n -> x] for each child x of n
        if n == vroot:
            neighbors = list(tree.node_children[n])
        else:
            neighbors = [int(tree.node_parent[n])] + tree.node_children[n]
        for x in tree.node_children[n]:
            ins = []
            for y in neighbors:
                if y == x:
                    continue
                if y == tree.node_parent[n] and n != vroot:
                    ins.append((didx(y, n), int(tree.node_edge[n])))
                else:
                    ins.append((didx(y, n), int(tree.node_edge[y])))
            (i1, e1), (i2, e2) = ins
            down_ops.append((didx(n, x), i1, e1, i2, e2))
        for x in tree.node_children[n]:
            down(x)

    down(vroot)

    ops = np.asarray(up_ops + down_ops, dtype=np.int32)

    E = tree.n_edges
    u_idx = np.zeros(E, dtype=np.int32)
    v_idx = np.zeros(E, dtype=np.int32)
    for e in range(E):
        c = int(tree.edge_child[e])
        p = int(tree.edge_parent[e])
        v_idx[e] = didx(c, p)
        u_idx[e] = didx(p, c)

    n_clvs = T + 3 * tree.n_inner
    return TreeOps(n_tips=T, n_clvs=n_clvs, ops=ops, u_idx=u_idx, v_idx=v_idx)


def tip_clv_matrix(tree: Tree, msa, num_states: int) -> np.ndarray:
    """[tips, sites, states] multi-hot tip CLVs, linking MSA rows to tree tips
    by label (reference: src/core/pll/epa_pll_util.cpp:10-60)."""
    by_label = {}
    for s in msa:
        by_label[s.header] = s.sequence
    sites = msa.num_sites
    out = np.zeros((tree.n_tips, sites, num_states), dtype=np.float64)
    missing = []
    for t, label in enumerate(tree.labels):
        seq = by_label.get(label)
        if seq is None:
            missing.append(label)
            continue
        out[t] = mask_to_clv_rows(encode_states(seq, num_states), num_states)
    if missing:
        raise ValueError(
            "The reference Tree contained taxa that could not be found in "
            f"the reference MSA: {', '.join(missing)}")
    return out


def tip_state_masks(tree: Tree, msa, num_states: int) -> np.ndarray:
    """[tips, sites] uint32 per-site state bitmask per tip (for invariant
    site detection)."""
    by_label = {s.header: s.sequence for s in msa}
    sites = msa.num_sites
    out = np.zeros((tree.n_tips, sites), dtype=np.uint32)
    missing = []
    for t, label in enumerate(tree.labels):
        seq = by_label.get(label)
        if seq is None:  # same error as tip_clv_matrix (epa_pll_util.cpp
            missing.append(label)  # link_tree_msa missing-taxa semantics)
            continue
        out[t] = encode_states(seq, num_states)
    if missing:
        raise ValueError(
            "The reference Tree contained taxa that could not be found in "
            f"the reference MSA: {', '.join(missing)}")
    return out


def invariant_states(masks: np.ndarray, num_states: int) -> np.ndarray:
    """Per-site invariant state index, -1 where not invariant: a site is
    invariant iff the intersection of all tip state sets is a single state
    (libpll ``pll_update_invariant_sites`` semantics)."""
    inter = masks[0].copy()
    for row in masks[1:]:
        inter &= row
    popcount = np.zeros_like(inter)
    tmp = inter.copy()
    while tmp.any():
        popcount += tmp & 1
        tmp >>= 1
    state = np.full(inter.shape, -1, dtype=np.int32)
    single = popcount == 1
    if single.any():
        state[single] = np.log2(inter[single]).astype(np.int32)
    return state


def compute_clvs(ops: TreeOps, P: jnp.ndarray, tip_clvs: jnp.ndarray,
                 num_rates: int):
    """Run the scan; returns (buffer [C,R,K,S], logscale [C,R,S]).

    Sites ride the last (TPU lane) axis: trailing dims of (rates, states)
    would be padded to the (8, 128) tile — a 32x memory/VPU blowup for DNA —
    so every CLV tensor in the framework is laid out site-last.
    """
    return _compute_clvs_core(jnp.asarray(ops.ops), P,
                              jnp.asarray(tip_clvs, P.dtype), ops.n_clvs,
                              num_rates)


def _compute_clvs_core(ops_arr, P, tip_clvs, n_clvs: int, num_rates: int):
    dtype = P.dtype
    T, S, K = tip_clvs.shape
    buf = jnp.zeros((n_clvs, num_rates, K, S), dtype=dtype)
    tips = tip_clvs.transpose(0, 2, 1)  # [T, K, S]
    buf = buf.at[:T].set(tips[:, None, :, :])
    ls = jnp.zeros((n_clvs, num_rates, S), dtype=dtype)

    def step(carry, op):
        buf, ls = carry
        out, i1, e1, i2, e2 = op[0], op[1], op[2], op[3], op[4]
        m1 = jnp.einsum("rij,rjs->ris", P[e1], buf[i1], precision=_PP)
        m2 = jnp.einsum("rij,rjs->ris", P[e2], buf[i2], precision=_PP)
        clv = m1 * m2
        # per-(site, rate) rescaling: the analog of libpll's
        # PLL_ATTRIB_RATE_SCALERS. Joint per-site scaling underflows the
        # slow gamma categories in f32 on deep trees (each category's scale
        # drifts apart along the tree), which silently corrupts logls.
        scale = jnp.max(clv, axis=1)              # [R, S]
        safe = jnp.where(scale > 0, scale, 1.0)
        clv = clv / safe[:, None, :]
        lsc = ls[i1] + ls[i2] + jnp.log(safe)
        return (buf.at[out].set(clv), ls.at[out].set(lsc)), None

    (buf, ls), _ = jax.lax.scan(step, (buf, ls), ops_arr)
    return buf, ls


@dataclass
class EdgeTensors:
    """The HBM-resident per-edge CLV tensors — the framework's core artifact
    (the analog of the reference's precomputed partition +
    ``--dump-binary`` CLV store). Site-last layout (see compute_clvs)."""
    U: jnp.ndarray        # [E, R, K, S] rest-of-tree CLV per edge
    V: jnp.ndarray        # [E, R, K, S] subtree CLV per edge
    lsU: jnp.ndarray      # [E, R, S] per-rate log scale of U
    lsV: jnp.ndarray      # [E, R, S]
    lengths: jnp.ndarray  # [E]


def build_edge_tensors(tree: Tree, eig: EigenModel, tip_clvs: np.ndarray,
                       dtype=jnp.float64) -> EdgeTensors:
    edges, _ = build_reference_state(tree, eig, tip_clvs, dtype=dtype)
    return edges


def build_reference_state(tree: Tree, eig: EigenModel, tip_clvs: np.ndarray,
                          dtype=jnp.float64, inv_logterm=None,
                          site_weights=None):
    """EdgeTensors + reference-tree log-likelihood in ONE jitted
    computation (P matrices -> CLV scan -> edge gathers -> edge logl).

    ``site_weights``: [S] per-column multiplicities for the logl sum when
    ``tip_clvs`` holds pattern-COMPRESSED columns (the site-repeats analog,
    reference: src/io/file_io.cpp:216-220) — identical alignment columns
    produce identical CLV columns everywhere in the tree, so the scan runs
    once per unique pattern and the logl weights each pattern by its
    column count. None = every column weight 1.

    The whole init path compiles once and persists in the compilation
    cache; stage-by-stage eager dispatch cost minutes of XLA compiles per
    process on tunneled TPU backends.
    """
    ops = build_tree_ops(tree)
    U, V, lsU, lsV, logl = _reference_state_jit(
        jnp.asarray(ops.ops), jnp.asarray(ops.u_idx),
        jnp.asarray(ops.v_idx), jnp.asarray(tip_clvs, dtype),
        jnp.asarray(tree.edge_lengths, dtype),
        jnp.asarray(eig.eigenvals, dtype), jnp.asarray(eig.A, dtype),
        jnp.asarray(eig.Ainv, dtype), jnp.asarray(eig.rates, dtype),
        jnp.asarray(eig.weights, dtype), jnp.asarray(eig.freqs, dtype),
        inv_logterm,
        None if site_weights is None else jnp.asarray(site_weights, dtype),
        n_clvs=ops.n_clvs, pinv=eig.pinv)
    edges = EdgeTensors(U=U, V=V, lsU=lsU, lsV=lsV,
                        lengths=jnp.asarray(tree.edge_lengths, dtype))
    return edges, float(logl)


def invariant_pattern_logls(tree: Tree, eig: EigenModel, dtype=jnp.float64):
    """[K] log-likelihood of each all-invariant dummy column (state k at
    every tip), evaluated on the reference tree — the input to the
    ascertainment-bias correction (ops.likelihood.asc_bias_correction)."""
    from epa_ng_tpu.ops import likelihood
    K = eig.A.shape[-1]
    ops = build_tree_ops(tree)
    tip = np.broadcast_to(np.eye(K)[None], (tree.n_tips, K, K)).copy()
    P = pmatrices(eig, jnp.asarray(tree.edge_lengths, dtype), dtype=dtype)
    buf, ls = _compute_clvs_core(jnp.asarray(ops.ops), P,
                                 jnp.asarray(tip, dtype), ops.n_clvs,
                                 len(eig.rates))
    u0, v0 = int(ops.u_idx[0]), int(ops.v_idx[0])
    return likelihood.edge_logl_persite(
        buf[u0], ls[u0], buf[v0], ls[v0], P[0],
        jnp.asarray(eig.freqs, dtype), jnp.asarray(eig.weights, dtype))


@partial(jax.jit, static_argnames=("n_clvs", "pinv"))
def _reference_state_jit(ops_arr, u_idx, v_idx, tip_clvs, edge_lengths,
                         eigenvals, A, Ainv, rates, weights, freqs,
                         inv_logterm, site_weights, n_clvs: int, pinv: float):
    from epa_ng_tpu.ops import likelihood
    t = edge_lengths[:, None] * rates / (1.0 - pinv)
    expd = jnp.exp(t[..., None] * eigenvals)              # [E, R, K]
    if A.ndim == 3:   # matrix mixture: per-category eigen systems
        P = jnp.maximum(jnp.einsum("rik,erk,rkj->erij", A, expd, Ainv,
                                   precision=_PP), 0.0)
    else:
        P = jnp.maximum(
            jnp.einsum("ik,...k,kj->...ij", A, expd, Ainv, precision=_PP), 0.0)
    buf, ls = _compute_clvs_core(ops_arr, P, tip_clvs, n_clvs,
                                 rates.shape[0])
    U, V, lsU, lsV = buf[u_idx], buf[v_idx], ls[u_idx], ls[v_idx]
    logl = likelihood.edge_loglikelihood(
        U[0], lsU[0], V[0], lsV[0], P[0], freqs, weights, pinv=pinv,
        inv_logterm=inv_logterm, site_mask=site_weights)
    return U, V, lsU, lsV, logl
