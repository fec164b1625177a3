"""Independent brute-force likelihood implementation for cross-checking.

Deliberately shares NO code path with epa_ng_tpu.ops: transition matrices via
scipy.linalg.expm (not eigendecomposition), CLVs via plain recursive python
over the parsed tree (no scan, no scaling — adequate for the small test
data), likelihood summed in plain loops.
"""

import numpy as np
from scipy.linalg import expm

from epa_ng_tpu.models.charmaps import encode_states, mask_to_clv_rows


def brute_rate_matrix(rates, freqs):
    n = len(freqs)
    Q = np.zeros((n, n))
    k = 0
    for i in range(n):
        for j in range(i + 1, n):
            Q[i, j] = rates[k] * freqs[j]
            Q[j, i] = rates[k] * freqs[i]
            k += 1
    for i in range(n):
        Q[i, i] = -Q[i].sum()
    scale = -(freqs * np.diag(Q)).sum()
    return Q / scale


def brute_tree_loglikelihood(tree, msa, model):
    """Log-likelihood of the full reference tree, rooted at the vroot."""
    K = model.num_states
    # per-category (Q, freqs): matrix mixtures (LG4M/LG4X) carry one
    # substitution matrix per rate category, uniform models share one
    if getattr(model, "submodels", None):
        comps = [(brute_rate_matrix(np.asarray(r), np.asarray(f)),
                  np.asarray(f)) for r, f in model.submodels]
    else:
        freqs = np.asarray(model.base_freqs)
        Q1 = brute_rate_matrix(np.asarray(model.subst_rates), freqs)
        comps = None
    cat_rates = np.asarray(model.ratecat_rates)
    cat_w = np.asarray(model.ratecat_weights)
    pinv = model.pinv

    by_label = {s.header: s.sequence for s in msa}
    sites = msa.num_sites

    def clv(node, rate, Q):
        if not tree.node_children[node]:
            seq = by_label[tree.labels[node]]
            return mask_to_clv_rows(encode_states(seq, K), K)  # [S, K]
        out = np.ones((sites, K))
        for c in tree.node_children[node]:
            t = tree.edge_lengths[tree.node_edge[c]] * rate / (1.0 - pinv)
            P = expm(Q * t)
            out = out * (clv(c, rate, Q) @ P.T)
        return out

    # mixture over rate categories
    site_lk = np.zeros(sites)
    for r_i, (r, w) in enumerate(zip(cat_rates, cat_w)):
        Qr, fr = comps[r_i] if comps else (Q1, freqs)
        site_lk += w * (clv(tree.vroot, r, Qr) @ fr)

    if pinv > 0:
        if comps is not None:
            raise NotImplementedError("p-inv with matrix mixtures")
        masks = np.stack([encode_states(by_label[l], K) for l in tree.labels])
        inter = masks[0].copy()
        for row in masks[1:]:
            inter &= row
        inv_term = np.zeros(sites)
        for s in range(sites):
            v = int(inter[s])
            if v and (v & (v - 1)) == 0:
                inv_term[s] = pinv * freqs[int(np.log2(v))]
        site_lk = (1.0 - pinv) * site_lk + inv_term

    return float(np.log(site_lk).sum())
