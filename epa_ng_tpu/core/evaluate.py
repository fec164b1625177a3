"""ML evaluation of model parameters + reference-tree branch lengths.

The analog of the reference's all-params ``optimize()``
(src/core/pll/optimize.cpp:329-455: empirical freqs, then a loop of
substitution-rate optimization -> full-tree branch-length optimization ->
alpha Brent search until the log-likelihood improvement drops below
OPT_EPSILON). The TPU-native formulation optimizes the same objective
differently: branch lengths, substitution rates and (optionally) base
frequencies move jointly by L-BFGS on the jitted reference-tree
log-likelihood via ``jax.grad`` — the whole likelihood (eigendecomposition,
P(t), CLV scan, edge logl) is differentiable — while the Gamma shape alpha
(whose discretization runs through incomplete-gamma quantiles on the host)
alternates in an outer golden-section search.
"""

from __future__ import annotations

import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from epa_ng_tpu.models.gamma import discrete_gamma_rates
from epa_ng_tpu.models.model import ParamValue, _n_rates
from epa_ng_tpu.ops.clv import _compute_clvs_core, build_tree_ops

_PP = jax.lax.Precision.HIGHEST

log = logging.getLogger("epa_ng_tpu")

OPT_EPSILON = 1.0  # outer-loop convergence (reference optimize.cpp:342)
MIN_BL, MAX_BL = 1e-6, 100.0
MIN_RATE, MAX_RATE = 1e-3, 1e3
ALPHA_MIN, ALPHA_MAX = 0.02, 100.0


def _rate_expander(model):
    """(n_free, expand(uniq)->full_rates) honoring the model's symmetry."""
    if model.gt_dna_sym is not None:
        from epa_ng_tpu.models.model import _gt_expand
        sym = model.gt_dna_sym
        idx = np.asarray([int(c) for c in sym])
        n = max(idx) + 1
        # structural zeros of the genotype expansion, as a 0/1 matrix
        # applied to the expanded 6-vector
        basis = np.stack([_gt_expand((idx == i).astype(np.float64))
                          for i in range(n)])          # [n, 45]

        def expand(uniq):
            return jnp.einsum("i,ij->j", uniq, jnp.asarray(basis))
        return n, expand
    if model.rate_sym is not None:
        idx = np.asarray([int(c) for c in model.rate_sym])
        n = max(idx) + 1

        def expand(uniq):
            return uniq[jnp.asarray(idx)]
        return n, expand
    nr = _n_rates(model.num_states)
    return nr, lambda uniq: uniq


@partial(jax.jit, static_argnames=("n_clvs", "asc_kind", "n_real"))
def _neg_logl(log_bl, log_uniq, freq_logits, pinv_logit, rate_basis,
              ops_arr, u0, v0, tip_clvs, cat_rates, cat_weights,
              inv_state, asc_w, n_clvs: int, asc_kind=None, n_real=0):
    """Differentiable reference-tree negative log-likelihood.

    rate_basis: [n_free, NR] expansion matrix from free rates to the full
    exchangeability vector; u0/v0: the CLV indices of edge 0's endpoints;
    pinv_logit: scalar, sigmoid -> proportion of invariant sites (pass
    -inf-ish for pinv == 0); inv_state: [S] invariant state index or -1.
    """
    dtype = tip_clvs.dtype
    K = tip_clvs.shape[2]
    rates_full = jnp.einsum("i,ij->j", jnp.exp(log_uniq), rate_basis)
    freqs = jax.nn.softmax(freq_logits)
    pinv = jax.nn.sigmoid(pinv_logit)
    # Q build (ops.eigen.build_rate_matrix, differentiably)
    iu = jnp.triu_indices(K, k=1)
    S = jnp.zeros((K, K), dtype).at[iu].set(rates_full)
    S = S + S.T
    Q = S * freqs[None, :]
    Q = Q - jnp.diag(jnp.sum(Q, axis=1))
    scale = -jnp.sum(freqs * jnp.diag(Q))
    Q = Q / scale
    sqrt_pi = jnp.sqrt(freqs)
    B = sqrt_pi[:, None] * Q / sqrt_pi[None, :]
    B = (B + B.T) / 2
    eigvals, W = jnp.linalg.eigh(B)
    A = W / sqrt_pi[:, None]
    Ainv = W.T * sqrt_pi[None, :]

    bl = jnp.exp(log_bl)
    # libpll convention: time scaled by 1/(1-pinv) (ops.eigen.pmatrices)
    t = bl[:, None] * cat_rates / (1.0 - pinv)       # [E, R]
    expd = jnp.exp(t[..., None] * eigvals)           # [E, R, K]
    P = jnp.maximum(
        jnp.einsum("ik,erk,kj->erij", A, expd, Ainv, precision=_PP), 0.0)

    buf, ls = _compute_clvs_core(ops_arr, P, tip_clvs, n_clvs,
                                 cat_rates.shape[0])
    from epa_ng_tpu.ops import likelihood
    inv_logterm = jnp.where(
        inv_state >= 0,
        jnp.log(pinv * freqs[jnp.maximum(inv_state, 0)]),
        -jnp.inf)
    persite = likelihood.edge_logl_persite(
        buf[u0], ls[u0], buf[v0], ls[v0], P[0], freqs, cat_weights,
        pinv=pinv, inv_logterm=inv_logterm)
    if asc_kind is None:
        logl = jnp.sum(persite)
    else:
        # the last K pseudo-sites are the dummy invariant columns
        # (ASC + pinv is rejected at parse, so inv_logterm is inert here)
        logl = jnp.sum(persite[:n_real]) + likelihood.asc_bias_correction(
            persite[n_real:], asc_kind, asc_w, n_real)
    return -logl


def _golden_section(f, lo, hi, tol=1e-3, max_iters=40):
    """Scalar minimizer (the role of pllmod's Brent for alpha)."""
    gr = (np.sqrt(5.0) - 1) / 2
    a, b = lo, hi
    c, d = b - gr * (b - a), a + gr * (b - a)
    fc, fd = f(c), f(d)
    for _ in range(max_iters):
        if abs(b - a) < tol * (abs(a) + abs(b)):
            break
        if fc < fd:
            b, d, fd = d, c, fc
            c = b - gr * (b - a)
            fc = f(c)
        else:
            a, c, fc = c, d, fd
            d = a + gr * (b - a)
            fd = f(d)
    return (c, fc) if fc < fd else (d, fd)


def optimize_model(tree, ref_msa, model, dtype=jnp.float64,
                   lbfgs_steps: int = 200) -> float:
    """Optimize free parameters in place; returns the final logl.

    Moves: branch lengths (always), substitution rates (rates_mode == ML),
    base frequencies (freqs_mode == ML), alpha (gamma with alpha_mode ML).
    Updates ``tree.edge_lengths`` and the model fields.
    """
    import optax

    from epa_ng_tpu.ops import clv as clv_ops
    if getattr(model, "submodels", None):
        raise ValueError(
            "--opt-model does not support matrix-mixture models "
            "(LG4M/LG4X); their matrices are fixed model data")
    ops = build_tree_ops(tree)
    tip_clvs = jnp.asarray(
        clv_ops.tip_clv_matrix(tree, ref_msa, model.num_states), dtype)
    u0 = int(ops.u_idx[0])
    v0 = int(ops.v_idx[0])
    ops_arr = jnp.asarray(ops.ops)

    n_free, expand = _rate_expander(model)
    # expansion as a matrix so it jits as data
    eye = np.eye(n_free)
    basis = np.stack([np.asarray(expand(jnp.asarray(eye[i])))
                      for i in range(n_free)])
    basis_j = jnp.asarray(basis, dtype)

    opt_rates = model.rates_mode == ParamValue.ML
    opt_freqs = model.freqs_mode == ParamValue.ML
    opt_alpha = (model.rate_het == "gamma" and model.num_ratecats > 1
                 and model.alpha_mode in (ParamValue.ML,
                                          ParamValue.UNDEFINED))
    opt_pinv = model.pinv_mode in (ParamValue.ML, ParamValue.EMPIRICAL)

    # invariant-site states (for the p-inv mixture term)
    if model.pinv > 0 or opt_pinv:
        masks = clv_ops.tip_state_masks(tree, ref_msa, model.num_states)
        inv_state = clv_ops.invariant_states(masks, model.num_states)
    else:
        inv_state = np.full(ref_msa.num_sites, -1, np.int32)

    n_real = ref_msa.num_sites
    asc_kind = model.ascbias_type
    K = model.num_states
    if asc_kind is not None:
        # append the K dummy invariant columns as extra sites so the
        # correction rides the same (differentiable) CLV scan
        eyecols = np.broadcast_to(np.eye(K)[None],
                                  (tree.n_tips, K, K))
        tip_clvs = jnp.concatenate(
            [tip_clvs, jnp.asarray(eyecols, dtype)], axis=1)
        inv_state = np.concatenate([inv_state,
                                    np.full(K, -1, np.int32)])
    asc_w = jnp.asarray(
        model.ascbias_weights if model.ascbias_weights is not None
        else np.zeros(K), dtype)
    inv_state_j = jnp.asarray(inv_state)

    # initial parameters
    uniq0 = np.zeros(n_free)
    if model.rate_sym is not None:
        for pos, c in enumerate(model.rate_sym):
            uniq0[int(c)] = model.subst_rates[pos]
    elif model.gt_dna_sym is not None:
        uniq0[:] = 1.0
    else:
        uniq0[:] = model.subst_rates[:n_free]
    pinv0 = float(model.pinv) if model.pinv > 0 else (
        0.1 if opt_pinv else 1e-12)
    init_all = {
        "log_bl": jnp.asarray(
            np.log(np.clip(tree.edge_lengths, MIN_BL, MAX_BL)), dtype),
        "log_uniq": jnp.asarray(np.log(np.clip(uniq0, MIN_RATE, MAX_RATE)),
                                dtype),
        "freq_logits": jnp.asarray(np.log(model.base_freqs), dtype),
        "pinv_logit": jnp.asarray(
            np.log(pinv0) - np.log1p(-pinv0), dtype),
    }
    # pinv alternates as a bounded scalar (like alpha; the reference uses
    # EM/Brent for it) — joint L-BFGS in the pinv direction is numerically
    # fragile. Fixed parameters are closed over as constants, NOT
    # zero-gradient entries of the optimization pytree: L-BFGS curvature
    # estimates and line searches move zero-gradient coordinates anyway.
    frozen = {k for k, on in
              [("log_uniq", opt_rates), ("freq_logits", opt_freqs)]
              if not on} | {"pinv_logit"}
    fixed = {k: v for k, v in init_all.items() if k in frozen}
    params = {k: v for k, v in init_all.items() if k not in frozen}

    alpha = float(model.alpha)
    weights = jnp.asarray(model.ratecat_weights, dtype)

    def cat_rates_for(a: float):
        if model.rate_het == "gamma" and model.num_ratecats > 1:
            r = discrete_gamma_rates(a, model.num_ratecats, model.gamma_mode)
        else:
            r = np.asarray(model.ratecat_rates)
        return jnp.asarray(r, dtype)

    _clips = {"log_bl": (np.log(MIN_BL), np.log(MAX_BL)),
              "log_uniq": (np.log(MIN_RATE), np.log(MAX_RATE)),
              # keep pinv in (1e-6, 0.9): near 1 the 1/(1-pinv) time
              # scaling overflows exp() and the loss goes numerically bogus
              "pinv_logit": (-13.8, 2.2),
              # frequencies live through softmax; bound the logits only
              # against runaway drift
              "freq_logits": (-30.0, 30.0)}

    def loss_fn(p, cat_rates):
        q = {**fixed, **p}
        return _neg_logl(q["log_bl"], q["log_uniq"], q["freq_logits"],
                         q["pinv_logit"], basis_j, ops_arr, u0, v0,
                         tip_clvs, cat_rates, weights, inv_state_j, asc_w,
                         n_clvs=ops.n_clvs, asc_kind=asc_kind,
                         n_real=n_real)

    value_and_grad = jax.jit(jax.value_and_grad(loss_fn))

    def lbfgs_round(p, cat_rates, steps):
        opt = optax.lbfgs()
        state = opt.init(p)

        @jax.jit
        def step(p, state):
            value, grad = value_and_grad(p, cat_rates)
            updates, state = opt.update(
                grad, state, p, value=value, grad=grad,
                value_fn=lambda q: loss_fn(q, cat_rates))
            p = optax.apply_updates(p, updates)
            p = jax.tree.map(jnp.nan_to_num, p)
            p = {k: jnp.clip(v, *_clips[k]) for k, v in p.items()}
            return p, state, value
        # early stop on loss plateau, checked every CHECK steps (a
        # per-step host sync would serialize the whole L-BFGS run behind
        # device round trips): the reference's inner optimizers carry
        # their own epsilons too (pllmod opt, optimize.cpp:329-455), and
        # on big trees the fixed 200-step round is mostly plateau
        CHECK, INNER_EPS = 20, OPT_EPSILON / 10.0
        value = None
        prev = None
        for i in range(steps):
            p, state, value = step(p, state)
            if (i + 1) % CHECK == 0:
                v = float(value)
                if prev is not None and abs(prev - v) < INNER_EPS:
                    break
                prev = v
        return p, float(value)

    neg = float(loss_fn(params, cat_rates_for(alpha)))
    log.info("Optimization: starting logl %.6f", -neg)

    for round_i in range(10):  # outer loop (reference optimize.cpp:337-452)
        params, neg_new = lbfgs_round(params, cat_rates_for(alpha),
                                      lbfgs_steps)
        if opt_alpha:
            def alpha_obj(a):
                return float(loss_fn(params, cat_rates_for(a)))
            alpha, neg_new = _golden_section(alpha_obj, ALPHA_MIN, ALPHA_MAX)
        if opt_pinv:
            cat = cat_rates_for(alpha)

            def pinv_obj(logit):
                fixed["pinv_logit"] = jnp.asarray(logit, dtype)
                return float(loss_fn(params, cat))
            logit, neg_new = _golden_section(pinv_obj, -13.8, 2.2)
            fixed["pinv_logit"] = jnp.asarray(logit, dtype)
        if abs(neg - neg_new) < OPT_EPSILON:
            neg = neg_new
            break
        neg = neg_new
        log.info("Optimization round %d: logl %.6f (alpha %.4f)",
                 round_i + 1, -neg, alpha)

    # write back
    tree.edge_lengths = np.asarray(jnp.exp(params["log_bl"]), np.float64)
    if opt_rates:
        uniq = np.exp(np.asarray(params["log_uniq"]))
        full = np.asarray(expand(jnp.asarray(uniq)))
        model.subst_rates = full / (full[-1] if full[-1] else 1.0)
    if opt_freqs:
        f = np.exp(np.asarray(params["freq_logits"]))
        model.base_freqs = f / f.sum()
    if opt_pinv:
        model.pinv = float(jax.nn.sigmoid(fixed["pinv_logit"]))
    if opt_alpha:
        model.set_alpha(alpha)
    # recompute the final logl from the written-back state so the reported
    # value is exactly the model the engine will use
    neg = float(loss_fn(params, cat_rates_for(alpha)))
    log.info("Optimized model: %s, logl %.6f", model.to_string(), -neg)
    return -neg
