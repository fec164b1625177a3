"""Batched pplacer-style branch-length optimization (the thorough placement
kernel).

Re-designs the reference's per-(query,edge) Newton-Raphson dance
(src/core/pll/optimize.cpp:60-248 ``opt_branch_lengths_pplacer``) as one
vmapped computation over a padded block of (query, edge) pairs:

- the edge CLVs are transformed into the substitution model's eigenbasis
  ONCE PER TREE (:func:`transform_edges` -> :class:`BloTensors`), and query
  tips once per chunk (:func:`transform_queries`), after which every
  transition-matrix application along the optimization trajectory is a cheap
  elementwise ``exp(lambda * rate * t)`` scaling — the tensor analog of
  libpll's "sumtable". No basis transforms happen inside the hot loop.
- all per-pair tensors are laid out SITE-LAST ([RK, W] / [K, W]): the site
  axis rides the TPU's 128-lane dimension and the merged (rate, state) axis
  the sublanes, so f32 tiles are fully utilized (the naive [S, R, K] layout
  pads trailing dims of 4 to (8, 128) — a 32x blowup).
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
# Inner-Newton flat-region stopping rules. Without them, pairs whose
# pendant optimum sits at t = infinity (garbage pairs: query unrelated
# to the edge) crawl along the flat exponential asymptote at a
# near-constant Newton step and exhaust MAX_ITERS — measured on hardware
# (r05): ~37% of random pairs, dragging every lock-step 128-lane block
# to 30 iterations/solve. The reference's scalar loop pays the same 30
# crawl iterations and then accepts the unconverged point — those
# pendant values are equally arbitrary; the logl agrees to ~1e-8.
#
# GAIN_EPSILON: the Newton-decrement rule — at d2 < 0 the remaining
# objective gain to the local optimum is ~d1^2 / (2|d2|) (exact for both
# quadratic optima and the garbage pairs' exponential tails), so
# d1^2 <= GAIN_EPSILON * |d2| stops when at most ~0.005 logl remains,
# 10-20x under the smoothing epsilon (0.1).
# D1_EPSILON: absolute gradient floor (bounds the remaining gain by
# D1_EPSILON * brlen-range = 0.01 logl) for d2 >= 0 plateaus where the
# decrement is undefined.
GAIN_EPSILON = 1e-2
D1_EPSILON = 1e-4


class EigConsts(NamedTuple):
    """Per-model constants threaded through the kernels (a pytree).

    Matrix-mixture models (LG4M/LG4X) carry per-rate-category eigen
    systems: A/Ainv [R,K,K], eigenvals [R,K], freqs [R,K]; every kernel
    branches statically on A.ndim."""
    A: jnp.ndarray       # [K,K] | [R,K,K]
    Ainv: jnp.ndarray    # [K,K] | [R,K,K]
    eigenvals: jnp.ndarray  # [K] | [R,K]
    rates: jnp.ndarray   # [R]
    weights: jnp.ndarray  # [R]
    freqs: jnp.ndarray   # [K] | [R,K]
    pinv: jnp.ndarray    # scalar


def eig_consts(eig, dtype=jnp.float64) -> EigConsts:
    """EigConsts from an ops.eigen.EigenModel."""
    as_ = lambda x: jnp.asarray(x, dtype)
    return EigConsts(A=as_(eig.A), Ainv=as_(eig.Ainv),
                     eigenvals=as_(eig.eigenvals), rates=as_(eig.rates),
                     weights=as_(eig.weights), freqs=as_(eig.freqs),
                     pinv=as_(eig.pinv))


class BloTensors(NamedTuple):
    """Eigen-transformed, scale-folded edge tensors: the device-resident
    "sumtable store" that the thorough-placement hot path reads. Merged
    (rate, state) axis on sublanes, sites on lanes."""
    tU: jnp.ndarray       # [E, R*K, S] eigen-transformed rest-of-tree CLV
    tV: jnp.ndarray       # [E, R*K, S] eigen-transformed subtree CLV,
    #                       scale-folded (carries exp(lsU+lsV - ls))
    ls: jnp.ndarray       # [E, S] combined per-site log-scale (max over R)
    lengths: jnp.ndarray  # [E]


@jax.jit
def transform_edges(c: EigConsts, U, lsU, V, lsV, lengths,
                    site_map=None) -> BloTensors:
    """Build the BLO sumtable store from plain edge tensors
    (ops.clv.EdgeTensors layout: U, V [E,R,K,S]; lsU, lsV [E,R,S]).

    ``site_map``: [S_full] pattern index per original site when the edge
    tensors are pattern-compressed (site-repeats analog): the transform
    runs once per unique pattern, then gather-expands to full width (the
    Newton stage needs full-site addressing — query tips differ at
    duplicated reference columns)."""
    E, R, K, S = U.shape
    lsr = lsU + lsV                                    # [E,R,S]
    ls = jnp.max(lsr, axis=1)                          # [E,S]
    Vs = V * jnp.exp(lsr - ls[:, None, :])[:, :, None, :]
    if c.A.ndim == 3:
        tU = jnp.einsum("rkj,erjs->erks", c.Ainv, U, precision=_PP)
        tV = jnp.einsum("rkj,erjs->erks", c.Ainv, Vs, precision=_PP)
    else:
        tU = jnp.einsum("kj,erjs->erks", c.Ainv, U, precision=_PP)
        tV = jnp.einsum("kj,erjs->erks", c.Ainv, Vs, precision=_PP)
    tU = tU.reshape(E, R * K, S)
    tV = tV.reshape(E, R * K, S)
    if site_map is not None:
        tU = jnp.take(tU, site_map, axis=2)
        tV = jnp.take(tV, site_map, axis=2)
        ls = jnp.take(ls, site_map, axis=1)
    return BloTensors(tU=tU, tV=tV, ls=ls, lengths=lengths)


@jax.jit
def transform_queries(c: EigConsts, qclv):
    """Eigen-transform query tip CLVs: qclv [Q,K,S] -> tQ [Q,K,S].

    Mixture models transform per category -> [Q,R*K,S] (each category's
    Ainv differs, so the tip CLV no longer broadcasts over rates)."""
    if c.A.ndim == 3:
        R, K, _ = c.A.shape
        tQ = jnp.einsum("rkj,qjs->qrks", c.Ainv, qclv, precision=_PP)
        return tQ.reshape(tQ.shape[0], R * K, tQ.shape[3])
    return jnp.einsum("kj,qjs->qks", c.Ainv, qclv, precision=_PP)


def _x_flat(c: EigConsts):
    """exp exponents per merged (rate, state): [R*K]."""
    ev = c.eigenvals if c.eigenvals.ndim == 2 else c.eigenvals[None, :]
    x = ev * c.rates[:, None] / (1.0 - c.pinv)
    return x.reshape(-1)


def _newton(c: EigConsts, T, pinv_lin, site_mask, xmin, xmax, xtol, xguess):
    """Maximize logl(t) = sum_s m_s log((1-p) f_s(t) + pinv_lin_s) where
    f_s(t) = sum_j T[j,s] exp(x_j t); safeguarded Newton on dlogl/dt.
    T: [R*K, W] sumtable."""
    x_j = _x_flat(c)                                  # [RK]
    omp = 1.0 - c.pinv

    def derivs(t):
        E = jnp.exp(x_j * t)                          # [RK]
        f0 = jnp.einsum("js,j->s", T, E, precision=_PP)
        f1 = jnp.einsum("js,j->s", T, E * x_j, precision=_PP)
        f2 = jnp.einsum("js,j->s", T, E * x_j * x_j, precision=_PP)
        g = omp * f0 + pinv_lin
        g = jnp.maximum(g, jnp.finfo(g.dtype).tiny)
        r1 = omp * f1 / g
        d1 = jnp.sum(site_mask * r1)
        d2 = jnp.sum(site_mask * (omp * f2 / g - r1 * r1))
        return d1, d2

    # anchor the solver state to the data's compute dtype: the guess /
    # python-scalar bounds otherwise ride in as weak f64 under x64 and
    # the new slid carry would freeze that into the loop
    x0 = jnp.clip(xguess, xmin, xmax).astype(T.dtype)

    def body(_, state):
        x, done, slid = state
        d1, d2 = derivs(x)
        newton_x = x - d1 / jnp.where(d2 == 0, 1.0, d2)
        # proper maximum requires d2 < 0; otherwise slide toward the bound
        # in the uphill direction (cf. pllmod_opt_minimize_newton
        # fallback). A SECOND consecutive slide in the same direction
        # snaps straight TO the bound: the geometric approach would need
        # ~log2(range/xtol) iterations to pass the |dx| < xtol test for
        # an optimum that sits AT the bound (same rule as the Pallas
        # kernel, ops.pallas_blo — the two paths stay trajectory-equal).
        one = jnp.ones_like(slid)
        dirn = jnp.where(d1 > 0, one, -one)
        snap = (d2 >= 0) & (slid * dirn > 0)
        bound = jnp.where(d1 > 0, xmax, xmin)
        slide = jnp.where(snap, bound,
                          jnp.where(d1 > 0, (x + xmax) / 2,
                                    (x + xmin) / 2))
        xnew = jnp.where(d2 < 0, newton_x, slide)
        xnew = jnp.clip(xnew, xmin, xmax).astype(x.dtype)
        slid_n = jnp.where(d2 < 0, jnp.zeros_like(slid), dirn)
        converged = ((jnp.abs(xnew - x) < xtol)
                     | (jnp.abs(d1) <= D1_EPSILON)
                     | ((d2 < 0) & (d1 * d1 <= GAIN_EPSILON * -d2)))
        xnew = jnp.where(done, x, xnew)
        return xnew, done | converged, slid_n

    x, _, _ = jax.lax.fori_loop(0, MAX_ITERS, body,
                                (x0, jnp.asarray(False),
                                 jnp.zeros_like(x0)))
    return x


def _apply_p(c: EigConsts, tX, t):
    """Propagate an eigen-space CLV through P(t) back to the normal basis.
    tX: [R*K, W] -> [R, K(i), W]."""
    RK, W = tX.shape
    K = c.A.shape[-1]
    R = RK // K
    e = jnp.exp(_x_flat(c) * t)                       # [RK]
    Y = (tX * e[:, None]).reshape(R, K, W)
    if c.A.ndim == 3:
        return jnp.einsum("rik,rks->ris", c.A, Y, precision=_PP)
    return jnp.einsum("ik,rks->ris", c.A, Y, precision=_PP)


def _q_rk(c: EigConsts, tQ):
    """Broadcast a [K, W] eigen query tip over rate categories: [R*K, W].
    Mixture-model query tips arrive already per-category ([R*K, W])."""
    R = c.rates.shape[0]
    K = c.A.shape[-1]
    if tQ.shape[0] == R * K:
        return tQ
    W = tQ.shape[1]
    return jnp.broadcast_to(tQ[None], (R, K, W)).reshape(R * K, W)


def _logl(c: EigConsts, inner, tQ, pendant, pinv_lin, site_mask, ls):
    """Edge logl between the inner CLV (normal basis, [R,K,W]) and the query
    tip (eigen basis, [K,W] / mixture [R*K,W]) at the given pendant
    length."""
    Mq = _apply_p(c, _q_rk(c, tQ), pendant)           # [R,K,W]
    if c.freqs.ndim == 2:
        f = jnp.einsum("ris,ris,ri,r->s", inner, Mq, c.freqs, c.weights,
                       precision=_PP)
    else:
        f = jnp.einsum("ris,ris,i,r->s", inner, Mq, c.freqs, c.weights,
                       precision=_PP)
    g = (1.0 - c.pinv) * f + pinv_lin
    g = jnp.maximum(g, jnp.finfo(g.dtype).tiny)
    return jnp.sum(site_mask * (jnp.log(g) + ls))


def _sumtable(c: EigConsts, part, other):
    """Sumtable between a normal-basis partial ([R,K,W]) and an eigen-basis
    CLV ([R*K, W] or broadcastable): T[j=r*K+k, s]."""
    R, K, W = part.shape
    if c.A.ndim == 3:
        piA = c.A * c.freqs[:, :, None]               # [R, K(i), K(k)]
        a = jnp.einsum("ris,rik->rks", part, piA, precision=_PP)
    else:
        piA = c.A * c.freqs[:, None]                  # [K(i), K(k)]
        a = jnp.einsum("ris,ik->rks", part, piA, precision=_PP)
    T = c.weights[:, None, None] * a * other.reshape(R, K, W)
    return T.reshape(R * K, W)


def _optimize_one(c: EigConsts, tU, tV, tQ, ls, pinv_lin, site_mask,
                  orig_len, max_smoothings: int = SMOOTHINGS):
    """Optimize one (query, edge) pair. All args per-pair:
    tU, tV: [R*K, W] eigen-transformed edge CLVs (tV scale-folded);
    tQ: [K, W] transformed query tip; ls: [W] combined log-scale;
    pinv_lin: [W] linear p-inv site term (already includes exp(-ls));
    site_mask: [W]. Returns (logl, pendant, distal, proximal, done)."""
    half = orig_len / 2.0
    init = (DEFAULT_PENDANT, half, half)
    tQrk = _q_rk(c, tQ)

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
        inner = MU * MV                               # [R,K,W] normal basis

        # --- pendant NR: sumtable between inner CLV and query tip
        T1 = _sumtable(c, inner, tQrk)
        guess = jnp.where((pendant < BRLEN_MIN) | (pendant > BRLEN_MAX),
                          BRLEN_DEFAULT, pendant)
        new_pendant = _newton(c, T1, pinv_lin, site_mask,
                              BRLEN_MIN, BRLEN_MAX, BRLEN_MIN / 10.0, guess)

        # --- distal NR (constrained: proximal = orig - distal)
        Mq = _apply_p(c, tQrk, new_pendant)
        T2 = _sumtable(c, Mq * MU, tV)
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
    half = orig_len / 2.0
    tQrk = _q_rk(c, tQ)

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
        pendant2 = nr_branch(_sumtable(c, MU * MV, tQrk), pendant)
        Mq = _apply_p(c, tQrk, pendant2)
        # distal
        distal2 = nr_branch(_sumtable(c, Mq * MU, tV), distal)
        MV2 = _apply_p(c, tV, distal2)
        # proximal
        proximal2 = nr_branch(_sumtable(c, Mq * MV2, tU), proximal)

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
def blo_optimize_batch(c: EigConsts, tU, tV, tQ, ls, site_mask, orig_len,
                       inv_logfreq, sliding: bool = True,
                       max_smoothings: int = SMOOTHINGS):
    """Vmapped thorough placement over a padded pair block.

    tU, tV: [B, R*K, W] eigen-transformed per-pair edge CLV windows (tV
    scale-folded; see transform_edges); tQ: [B, K, W] eigen-transformed
    query tips (transform_queries); ls: [B, W] combined log-scale;
    site_mask: [B, W]; orig_len: [B]; inv_logfreq: [B, W] log(pinv*pi_inv)
    with -inf at non-invariant sites (or all -inf when pinv == 0).

    Returns (logl, pendant, distal_reported, distal_raw, proximal_raw,
    done): the reported distal is rescaled to the original branch length
    like the reference (Tiny_Tree.cpp:183-184).
    """

    def one(tu, tv, tq, l, m, orig, invf):
        # linear-space invariant term, counteracting the CLV scaling
        pinv_lin = jnp.exp(invf - l) * m
        if sliding:
            logl, pendant, distal, proximal, done = _optimize_one(
                c, tu, tv, tq, l, pinv_lin, m, orig, max_smoothings)
        else:
            logl, pendant, distal, proximal, done = _optimize_one_raxml(
                c, tu, tv, tq, l, pinv_lin, m, orig, max_smoothings)
        distal_rep = (orig / (distal + proximal)) * distal
        return logl, pendant, distal_rep, distal, proximal, done

    return jax.vmap(one)(tU, tV, tQ, ls, site_mask, orig_len, inv_logfreq)
