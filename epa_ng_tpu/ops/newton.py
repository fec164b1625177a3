"""Batched pplacer-style branch-length optimization (the thorough placement
kernel).

Re-designs the reference's per-(query,edge) Newton-Raphson dance
(src/core/pll/optimize.cpp:60-248 ``opt_branch_lengths_pplacer``) as one
vmapped computation over a padded block of (query, edge) pairs:

- all per-pair CLVs are transformed into the substitution model's eigenbasis
  ONCE (``tU = Ainv @ U`` etc.), after which every transition-matrix
  application along the optimization trajectory is a cheap elementwise
  ``exp(lambda * rate * t)`` scaling — the tensor analog of libpll's
  "sumtable",
- the outer smoothing loop (pendant NR -> constrained distal NR -> score,
  rollback on worse, converge at |dlogl| < 0.1) runs as ``lax.while_loop``
  with per-pair active masks,
- each inner Newton solve is a fixed-bound ``fori_loop`` with clamping to
  [branch_min, branch_max].

Semantics mirrored from the reference:
- initial lengths: pendant = -log(0.9), distal = proximal = original/2
  (src/core/pll/pll_util.cpp:354-386 ``reset_triplet_lengths``)
- pendant bounds [1e-6, 100] (PLLMOD_OPT_{MIN,MAX}_BRANCH_LEN)
- distal bounds [min(5e-7, orig/2), orig - tol] with proximal = orig - distal
  (optimize.cpp:171-210)
- rollback when new -logl worse than previous by > |new| * 1e-14
  (optimize.cpp:224-232); outer tolerance 0.1 (OPT_BRANCH_EPSILON)
- distal reported rescaled: orig/(distal+proximal) * distal
  (src/tree/Tiny_Tree.cpp:183-184)
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

# TPU matmuls downcast f32 operands to bf16 by default; the chained CLV
# contractions need full f32 precision (bf16 error compounds across ~tree
# depth products and corrupts logls on large trees).
_PP = jax.lax.Precision.HIGHEST

BRLEN_MIN = 1e-6     # PLLMOD_OPT_MIN_BRANCH_LEN
BRLEN_MAX = 100.0    # PLLMOD_OPT_MAX_BRANCH_LEN
BRLEN_DEFAULT = 0.1  # PLLMOD_OPT_DEFAULT_BRANCH_LEN
DEFAULT_PENDANT = 0.10536051565782628  # -log(0.9)
OPT_BRANCH_EPSILON = 1e-1
MAX_ITERS = 30       # inner Newton iterations (optimize.cpp:62)
SMOOTHINGS = 32      # outer iterations (optimize.cpp:269)


class EigConsts(NamedTuple):
    """Per-model constants threaded through the kernels (a pytree)."""
    A: jnp.ndarray       # [K,K]
    Ainv: jnp.ndarray    # [K,K]
    eigenvals: jnp.ndarray  # [K]
    rates: jnp.ndarray   # [R]
    weights: jnp.ndarray  # [R]
    freqs: jnp.ndarray   # [K]
    pinv: jnp.ndarray    # scalar


def eig_consts(eig, dtype=jnp.float64) -> EigConsts:
    """EigConsts from an ops.eigen.EigenModel."""
    as_ = lambda x: jnp.asarray(x, dtype)
    return EigConsts(A=as_(eig.A), Ainv=as_(eig.Ainv),
                     eigenvals=as_(eig.eigenvals), rates=as_(eig.rates),
                     weights=as_(eig.weights), freqs=as_(eig.freqs),
                     pinv=as_(eig.pinv))


def _exps(c: EigConsts, t):
    """exp(lambda_k * rate_r * t / (1-pinv)) -> [R, K] for scalar t."""
    x = c.eigenvals[None, :] * c.rates[:, None] / (1.0 - c.pinv)
    return jnp.exp(x * t), x


def _apply_p(c: EigConsts, tX, t):
    """P(t) @ X for an eigen-transformed CLV tX [S,R,K] -> [S,R,K]."""
    e, _ = _exps(c, t)
    return jnp.einsum("ik,rk,srk->sri", c.A, e, tX, precision=_PP)


def _newton(c: EigConsts, T, pinv_lin, site_mask, xmin, xmax, xtol, xguess):
    """Maximize logl(t) = sum_s m_s log((1-p) f_s(t) + pinv_lin_s) where
    f_s(t) = sum_rk T[s,r,k] exp(x_rk t); safeguarded Newton on dlogl/dt."""
    x_rk = c.eigenvals[None, :] * c.rates[:, None] / (1.0 - c.pinv)  # [R,K]
    omp = 1.0 - c.pinv

    def derivs(t):
        E = jnp.exp(x_rk * t)                         # [R,K]
        f0 = jnp.einsum("srk,rk->s", T, E, precision=_PP)
        f1 = jnp.einsum("srk,rk->s", T, E * x_rk, precision=_PP)
        f2 = jnp.einsum("srk,rk->s", T, E * x_rk * x_rk, precision=_PP)
        g = omp * f0 + pinv_lin
        g = jnp.maximum(g, jnp.finfo(g.dtype).tiny)
        r1 = omp * f1 / g
        d1 = jnp.sum(site_mask * r1)
        d2 = jnp.sum(site_mask * (omp * f2 / g - r1 * r1))
        return d1, d2

    x0 = jnp.clip(xguess, xmin, xmax)

    def body(_, state):
        x, done = state
        d1, d2 = derivs(x)
        newton_x = x - d1 / jnp.where(d2 == 0, 1.0, d2)
        # proper maximum requires d2 < 0; otherwise slide toward the bound
        # in the uphill direction (cf. pllmod_opt_minimize_newton fallback)
        slide = jnp.where(d1 > 0, (x + xmax) / 2, (x + xmin) / 2)
        xnew = jnp.where(d2 < 0, newton_x, slide)
        xnew = jnp.clip(xnew, xmin, xmax)
        converged = (jnp.abs(xnew - x) < xtol) | (d1 == 0)
        xnew = jnp.where(done, x, xnew)
        return xnew, done | converged

    x, _ = jax.lax.fori_loop(0, MAX_ITERS, body, (x0, jnp.asarray(False)))
    return x


def _logl(c: EigConsts, inner, tQ, pendant, pinv_lin, site_mask, ls):
    """Edge logl between the inner CLV and the query tip at given pendant."""
    Mq = _apply_p(c, tQ[:, None, :] * jnp.ones_like(inner), pendant)
    f = jnp.einsum("sri,sri,i,r->s", inner, Mq, c.freqs, c.weights, precision=_PP)
    g = (1.0 - c.pinv) * f + pinv_lin
    g = jnp.maximum(g, jnp.finfo(g.dtype).tiny)
    return jnp.sum(site_mask * (jnp.log(g) + ls))


def _optimize_one(c: EigConsts, tU, tV, tQ, ls, pinv_lin, site_mask,
                  orig_len, max_smoothings: int = SMOOTHINGS):
    """Optimize one (query, edge) pair. All args per-pair:
    tU, tV: [S,R,K] eigen-transformed edge CLVs; tQ: [S,K] transformed query
    tip; ls: [S] combined log-scale; pinv_lin: [S] linear p-inv site term
    (already includes exp(-ls)); site_mask: [S].
    Returns (logl, pendant, distal, proximal)."""
    piA = c.A * c.freqs[:, None]  # pi_i A_ik  [K,K]

    half = orig_len / 2.0
    init = (DEFAULT_PENDANT, half, half)

    def score(pendant, distal, proximal):
        MU = _apply_p(c, tU, proximal)
        MV = _apply_p(c, tV, distal)
        return _logl(c, MU * MV, tQ, pendant, pinv_lin, site_mask, ls)

    neg0 = -score(*init)

    dist_min = jnp.minimum(BRLEN_MIN / 2.0, orig_len / 2.0)
    dist_tol = dist_min / 10.0
    dist_max = orig_len - dist_tol

    def smooth_body(state):
        pendant, distal, proximal, neg_logl, it, done = state

        MU = _apply_p(c, tU, proximal)
        MV = _apply_p(c, tV, distal)
        inner = MU * MV  # [S,R,K]

        # --- pendant NR: sumtable between inner CLV and query tip
        a = jnp.einsum("sri,ik->srk", inner, piA, precision=_PP)
        T1 = c.weights[None, :, None] * a * tQ[:, None, :]
        guess = jnp.where((pendant < BRLEN_MIN) | (pendant > BRLEN_MAX),
                          BRLEN_DEFAULT, pendant)
        new_pendant = _newton(c, T1, pinv_lin, site_mask,
                              BRLEN_MIN, BRLEN_MAX, BRLEN_MIN / 10.0, guess)

        # --- distal NR (constrained: proximal = orig - distal)
        Mq = _apply_p(c, tQ[:, None, :] * jnp.ones_like(MU), new_pendant)
        part = Mq * MU  # partial toward the distal node
        a2 = jnp.einsum("sri,ik->srk", part, piA, precision=_PP)
        T2 = c.weights[None, :, None] * a2 * tV
        guess2 = jnp.where((distal < dist_min) | (distal > dist_max),
                           orig_len / 2.0, distal)
        new_distal = _newton(c, T2, pinv_lin, site_mask,
                             dist_min, dist_max, dist_tol, guess2)
        new_proximal = orig_len - new_distal

        new_neg = -score(new_pendant, new_distal, new_proximal)

        worse = (new_neg - neg_logl) > jnp.abs(new_neg) * 1e-14
        converged = jnp.abs(new_neg - neg_logl) < OPT_BRANCH_EPSILON

        # rollback keeps old lengths; otherwise accept
        pendant_out = jnp.where(worse | done, pendant, new_pendant)
        distal_out = jnp.where(worse | done, distal, new_distal)
        proximal_out = jnp.where(worse | done, proximal, new_proximal)
        neg_out = jnp.where(worse | done, neg_logl, new_neg)
        done_out = done | worse | converged
        return pendant_out, distal_out, proximal_out, neg_out, it + 1, done_out

    def smooth_cond(state):
        *_, it, done = state
        return (~done) & (it < max_smoothings)

    state = (jnp.asarray(init[0]), jnp.asarray(init[1]), jnp.asarray(init[2]),
             neg0, jnp.asarray(0), jnp.asarray(False))
    pendant, distal, proximal, neg_logl, _, done = jax.lax.while_loop(
        smooth_cond, smooth_body, state)
    return -neg_logl, pendant, distal, proximal, done


def _optimize_one_raxml(c: EigConsts, tU, tV, tQ, ls, pinv_lin, site_mask,
                        orig_len, max_smoothings: int = SMOOTHINGS):
    """--raxml-blo analog: per smoothing, NR each of the three branches
    independently in [BRLEN_MIN, BRLEN_MAX] (no sum constraint), like
    pllmod_opt_optimize_branch_lengths_local with radius 1."""
    piA = c.A * c.freqs[:, None]
    half = orig_len / 2.0

    def score(pendant, distal, proximal):
        MU = _apply_p(c, tU, proximal)
        MV = _apply_p(c, tV, distal)
        return _logl(c, MU * MV, tQ, pendant, pinv_lin, site_mask, ls)

    neg0 = -score(DEFAULT_PENDANT, half, half)

    def nr_branch(T, guess):
        g = jnp.where((guess < BRLEN_MIN) | (guess > BRLEN_MAX),
                      BRLEN_DEFAULT, guess)
        return _newton(c, T, pinv_lin, site_mask, BRLEN_MIN, BRLEN_MAX,
                       BRLEN_MIN / 10.0, g)

    def body(state):
        pendant, distal, proximal, neg_logl, it, done = state
        MU = _apply_p(c, tU, proximal)
        MV = _apply_p(c, tV, distal)

        # pendant
        a = jnp.einsum("sri,ik->srk", MU * MV, piA, precision=_PP)
        pendant2 = nr_branch(c.weights[None, :, None] * a * tQ[:, None, :],
                             pendant)
        Mq = _apply_p(c, tQ[:, None, :] * jnp.ones_like(MU), pendant2)
        # distal
        a2 = jnp.einsum("sri,ik->srk", Mq * MU, piA, precision=_PP)
        distal2 = nr_branch(c.weights[None, :, None] * a2 * tV, distal)
        MV2 = _apply_p(c, tV, distal2)
        # proximal
        a3 = jnp.einsum("sri,ik->srk", Mq * MV2, piA, precision=_PP)
        proximal2 = nr_branch(c.weights[None, :, None] * a3 * tU, proximal)

        new_neg = -score(pendant2, distal2, proximal2)
        worse = (new_neg - neg_logl) > jnp.abs(new_neg) * 1e-14
        converged = jnp.abs(new_neg - neg_logl) < OPT_BRANCH_EPSILON
        pendant_out = jnp.where(worse | done, pendant, pendant2)
        distal_out = jnp.where(worse | done, distal, distal2)
        proximal_out = jnp.where(worse | done, proximal, proximal2)
        neg_out = jnp.where(worse | done, neg_logl, new_neg)
        return (pendant_out, distal_out, proximal_out, neg_out, it + 1,
                done | worse | converged)

    def cond(state):
        *_, it, done = state
        return (~done) & (it < max_smoothings)

    state = (jnp.asarray(DEFAULT_PENDANT), jnp.asarray(half),
             jnp.asarray(half), neg0, jnp.asarray(0), jnp.asarray(False))
    pendant, distal, proximal, neg_logl, _, done = jax.lax.while_loop(
        cond, body, state)
    return -neg_logl, pendant, distal, proximal, done


@partial(jax.jit, static_argnames=("sliding", "max_smoothings"))
def blo_optimize_batch(c: EigConsts, U, lsU, V, lsV, qclv, site_mask,
                       orig_len, inv_logfreq, sliding: bool = True,
                       max_smoothings: int = SMOOTHINGS):
    """Vmapped thorough placement over a padded pair block.

    U, V: [B,S,R,K]; lsU, lsV: [B,S,R] per-rate log scales; qclv: [B,S,K]
    (multi-hot query tips); site_mask: [B,S]; orig_len: [B]; inv_logfreq:
    [B,S] log(pinv*pi_inv) with -inf at non-invariant sites (or all -inf
    when pinv == 0).

    Returns (logl, pendant, distal_reported, distal_raw, proximal_raw): the
    reported distal is rescaled to the original branch length like the
    reference (Tiny_Tree.cpp:183-184).
    """
    Ainv = c.Ainv

    def one(u, lsu, v, lsv, q, m, orig, invf):
        # fold the per-(site,rate) scales (max-shifted per site) into V so
        # the optimization sees correctly weighted rate categories
        lsr = lsu + lsv                         # [S, R]
        ls = jnp.max(lsr, axis=-1)              # [S]
        v = v * jnp.exp(lsr - ls[:, None])[..., None]
        tU = jnp.einsum("kj,srj->srk", Ainv, u, precision=_PP)
        tV = jnp.einsum("kj,srj->srk", Ainv, v, precision=_PP)
        tQ = jnp.einsum("kj,sj->sk", Ainv, q, precision=_PP)
        # linear-space invariant term, counteracting the CLV scaling
        pinv_lin = jnp.exp(invf - ls) * m
        if sliding:
            logl, pendant, distal, proximal, done = _optimize_one(
                c, tU, tV, tQ, ls, pinv_lin, m, orig, max_smoothings)
        else:
            logl, pendant, distal, proximal, done = _optimize_one_raxml(
                c, tU, tV, tQ, ls, pinv_lin, m, orig, max_smoothings)
        distal_rep = (orig / (distal + proximal)) * distal
        return logl, pendant, distal_rep, distal, proximal, done

    return jax.vmap(one)(U, lsU, V, lsV, qclv, site_mask, orig_len,
                         inv_logfreq)
