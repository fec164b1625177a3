"""Pallas TPU kernel for the thorough-placement Newton optimization.

Why a kernel: in the XLA path every Newton iteration re-reads the per-pair
sumtable T [pairs, R*K, W] from HBM, so the inner loop is pure HBM
bandwidth. This kernel keeps the ENTIRE per-pair working set resident in
VMEM across the whole optimization.

Key identity: with eigendecomposition Q = A Lambda A^-1 and
pi_i A_ik factored into G[k1,k2,k3] = sum_i pi_i A_ik1 A_ik2 A_ik3, the
placement objective is a trilinear form in eigen space:

  f_s(lp, ld, lq) = sum_r w_r sum_{k1,k2,k3} G[k1,k2,k3]
                    tU[s,r,k1] e^{x_{r,k1} lp}
                    tV[s,r,k2] e^{x_{r,k2} ld}
                    tQ[s,k3]   e^{x_{r,k3} lq}

so every length proposal only changes [pairs]-shaped exponential scale
vectors; all site-tensor products happen once per smoothing on VMEM tiles.

Inputs are the pre-transformed per-pair windows produced by
ops.newton.transform_edges / transform_queries — the same tensors the XLA
fallback consumes — so the only prologue work here is a transpose to the
kernel layout: pairs ride the 128-lane axis; tiles are [W, PB] per (r,k)
slice. The state/rate counts are trace-time constants derived from the
ref shapes: DNA (K=4) and protein (K=20), single-matrix AND matrix-
mixture (LG4M/LG4X — per-rate [RK, K] coefficient tables, per-category
query tips); +I models feed the linear invariant-site term through a
dedicated kernel variant (``has_pinv``). Wider states trade window
width for VMEM (blo_supported's RK*W budget).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from epa_ng_tpu.ops.newton import (BRLEN_DEFAULT, BRLEN_MAX, BRLEN_MIN,
                                   D1_EPSILON, DEFAULT_PENDANT,
                                   GAIN_EPSILON, MAX_ITERS,
                                   OPT_BRANCH_EPSILON, SMOOTHINGS)

PB = 128          # pairs per block (lane dimension)
# Independent accumulator trees in the Newton reductions: MEASURED a ~10%
# REGRESSION at 2 and 4 on the roofline shape (r05 A/B: t2 4.61 ms -> 5.07
# / 4.98) — each [W, PB] tile op already spans ~20 vregs of independent
# lanes, so the "serial chain" had ILP all along. Kept parameterized at 1.
N_ACC = 1
MAX_KERNEL_SITES = 1024  # VMEM budget bound on the window width (K=4)
# joint (states x rates) x window VMEM budget: the kernel keeps ~5 live
# [RK, W, PB] f32 tile sets (tU/tV scratch + back-transform/sumtable
# temporaries), so RK * W is the scaling knob. 24576 = the K=4 bound
# (16 * 1536) derated; for K=20 (RK=80) it caps the window at 256.
MAX_RK_SITES = 24576


def max_kernel_sites(rk: int) -> int:
    return min(MAX_KERNEL_SITES, MAX_RK_SITES // rk // 32 * 32)


def _blo_kernel(xrk_ref, wA_ref, A_ref, piA_ref, tU_ref, tV_ref, tQ_ref,
                mask_ref, orig_ref,
                logl_ref, pendant_ref, distal_ref, proximal_ref, done_ref,
                *, max_smoothings: int):
    """One pair-block. Refs:
    xrk_ref:  [RK, 1] SMEM  (eigenvalue*rate exponents)
    wA_ref:   [RK, K] SMEM  (w_r * A[i,k] laid out [r*K+i, k])
    A_ref:    [K, K]  SMEM  (eigenvector matrix A[i,k])
    piA_ref:  [K, K]  SMEM  (pi_i * A[i,k])
    tU_ref, tV_ref: [RK, W, PB] VMEM eigen-transformed CLVs
    tQ_ref:   [K, W, PB] VMEM eigen-transformed query tips
    mask_ref: [W, PB] site masks
    orig_ref: [1, PB] original branch lengths
    outputs:  [1, PB] each
    """
    _blo_compute(xrk_ref, wA_ref, A_ref, piA_ref, tU_ref, tV_ref, tQ_ref,
                 mask_ref, orig_ref,
                 None, logl_ref, pendant_ref, distal_ref, proximal_ref,
                 done_ref, max_smoothings=max_smoothings)


def _blo_kernel_counted(xrk_ref, wA_ref, A_ref, piA_ref, tU_ref, tV_ref,
                        tQ_ref, mask_ref, orig_ref,
                        logl_ref, pendant_ref, distal_ref, proximal_ref,
                        done_ref, iters_ref, smooth_ref,
                        *, max_smoothings: int):
    """Instrumented :func:`_blo_kernel`: two extra [1, PB] outputs record
    THIS BLOCK's executed inner-Newton trip count (summed over both
    solves and all smoothings; the lock-step loops execute their
    per-block max, which is exactly the roofline op model's constant)
    and its executed smoothing count — replacing the model's estimated
    6-iterations-per-solve with an on-hardware measurement."""
    _blo_compute(xrk_ref, wA_ref, A_ref, piA_ref, tU_ref, tV_ref, tQ_ref,
                 mask_ref, orig_ref,
                 None, logl_ref, pendant_ref, distal_ref, proximal_ref,
                 done_ref, max_smoothings=max_smoothings,
                 iters_ref=iters_ref, smooth_ref=smooth_ref)


def _blo_kernel_pinv(xrk_ref, omp_ref, wA_ref, A_ref, piA_ref, tU_ref,
                     tV_ref, tQ_ref, mask_ref, pinv_ref, orig_ref,
                     logl_ref, pendant_ref, distal_ref, proximal_ref,
                     done_ref, *, max_smoothings: int):
    """+I variant of :func:`_blo_kernel`: extra omp [1,1] SMEM and
    pinv [W, PB] VMEM (the per-(site,pair) linear invariant term)."""
    _blo_compute(xrk_ref, wA_ref, A_ref, piA_ref, tU_ref, tV_ref, tQ_ref,
                 mask_ref, orig_ref,
                 None, logl_ref, pendant_ref, distal_ref, proximal_ref,
                 done_ref, max_smoothings=max_smoothings,
                 pinv_ref=pinv_ref, omp_ref=omp_ref)


def _blo_kernel_blocked(offs_ref, act_ref, xrk_ref, wA_ref, A_ref, piA_ref,
                        tU_hbm, tV_hbm,
                        tQ_hbm, mask_ref, orig_ref, skip_ref,
                        logl_ref, pendant_ref, distal_ref, proximal_ref,
                        done_ref, tU_s, tV_s, tQ_s, sems,
                        *, max_smoothings: int):
    """Variant whose pair-block reads only ITS OWN site window out of the
    full-width gathered tensors: tU_hbm/tV_hbm [RK, S, NP] and tQ_hbm
    [K, S, NP] stay in HBM (memory_space=ANY); the block DMAs the
    [*, offs[p] : offs[p]+Wb, p*PB : (p+1)*PB] slice into VMEM scratch.
    This is the TPU analog of the reference's ``shift_partition_focus``
    (src/core/pll/pll_util.cpp:388-418): compute touches only each
    read's neighborhood, not the whole alignment, while the HBM gather
    stays a fast full-row copy.

    ``act_ref`` ([nb] prefetch scalars) marks blocks with any live pair:
    fully-skipped blocks (all pairs cut by the dynamic heuristic — the
    caller sorts dead pairs into the trailing blocks) bypass DMA and
    compute entirely. ``skip_ref`` [1, PB] marks individual dead lanes
    (1 = skip): their state is frozen so live lanes never wait on them."""
    p = pl.program_id(0)

    @pl.when(act_ref[p] > 0)
    def _run():
        off = pl.multiple_of(offs_ref[p], 8)
        Wb = tU_s.shape[1]
        copies = [
            pltpu.make_async_copy(
                tU_hbm.at[:, pl.ds(off, Wb), pl.ds(p * PB, PB)], tU_s,
                sems.at[0]),
            pltpu.make_async_copy(
                tV_hbm.at[:, pl.ds(off, Wb), pl.ds(p * PB, PB)], tV_s,
                sems.at[1]),
            pltpu.make_async_copy(
                tQ_hbm.at[:, pl.ds(off, Wb), pl.ds(p * PB, PB)], tQ_s,
                sems.at[2]),
        ]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()
        _blo_compute(xrk_ref, wA_ref, A_ref, piA_ref, tU_s, tV_s, tQ_s,
                     mask_ref, orig_ref,
                     skip_ref, logl_ref, pendant_ref, distal_ref,
                     proximal_ref, done_ref, max_smoothings=max_smoothings)

    @pl.when(act_ref[p] == 0)
    def _skip():
        dtype = tU_s.dtype
        zero = jnp.zeros((1, PB), dtype)
        logl_ref[...] = zero
        pendant_ref[...] = zero
        distal_ref[...] = zero
        proximal_ref[...] = zero
        done_ref[...] = zero


def _blo_kernel_blocked_pinv(offs_ref, act_ref, xrk_ref, omp_ref, wA_ref,
                             A_ref, piA_ref, tU_hbm, tV_hbm, tQ_hbm,
                             pinv_hbm, mask_ref, orig_ref, skip_ref,
                             logl_ref, pendant_ref, distal_ref,
                             proximal_ref, done_ref, tU_s, tV_s, tQ_s,
                             pinv_s, sems, *, max_smoothings: int):
    """+I variant of :func:`_blo_kernel_blocked`: a 4th per-block DMA
    brings the [Wb, PB] window of the per-(site,pair) linear invariant
    term pinv_hbm [S_pad, NP] into VMEM alongside tU/tV/tQ."""
    p = pl.program_id(0)

    @pl.when(act_ref[p] > 0)
    def _run():
        off = pl.multiple_of(offs_ref[p], 8)
        Wb = tU_s.shape[1]
        copies = [
            pltpu.make_async_copy(
                tU_hbm.at[:, pl.ds(off, Wb), pl.ds(p * PB, PB)], tU_s,
                sems.at[0]),
            pltpu.make_async_copy(
                tV_hbm.at[:, pl.ds(off, Wb), pl.ds(p * PB, PB)], tV_s,
                sems.at[1]),
            pltpu.make_async_copy(
                tQ_hbm.at[:, pl.ds(off, Wb), pl.ds(p * PB, PB)], tQ_s,
                sems.at[2]),
            pltpu.make_async_copy(
                pinv_hbm.at[pl.ds(off, Wb), pl.ds(p * PB, PB)], pinv_s,
                sems.at[3]),
        ]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()
        _blo_compute(xrk_ref, wA_ref, A_ref, piA_ref, tU_s, tV_s, tQ_s,
                     mask_ref, orig_ref,
                     skip_ref, logl_ref, pendant_ref, distal_ref,
                     proximal_ref, done_ref, max_smoothings=max_smoothings,
                     pinv_ref=pinv_s, omp_ref=omp_ref)

    @pl.when(act_ref[p] == 0)
    def _skip():
        dtype = tU_s.dtype
        zero = jnp.zeros((1, PB), dtype)
        logl_ref[...] = zero
        pendant_ref[...] = zero
        distal_ref[...] = zero
        proximal_ref[...] = zero
        done_ref[...] = zero


def _blo_compute(xrk_ref, wA_ref, A_ref, piA_ref, tU_ref, tV_ref, tQ_ref,
                 mask_ref, orig_ref,
                 skip_ref, logl_ref, pendant_ref, distal_ref, proximal_ref,
                 done_ref, *, max_smoothings: int,
                 pinv_ref=None, omp_ref=None,
                 iters_ref=None, smooth_ref=None):
    """``pinv_ref`` ([W, PB], optional): the linear invariant-site term
    exp(log(pinv*pi_state) - ls) per (site, pair) — the +I models' second
    mixture component. With it, every site likelihood becomes
    g = (1-pinv) * f + pinv_lin (omp_ref [1,1] SMEM holds 1-pinv), and
    the Newton derivatives carry the (1-pinv) factor — exactly the XLA
    path's arithmetic (ops.newton._newton / _logl)."""
    W = tU_ref.shape[1]
    dtype = tU_ref.dtype
    tiny = jnp.finfo(dtype).tiny
    # state/rate counts are trace-time constants of the ref shapes (DNA
    # K=4 and protein K=20 instantiate the same kernel). Matrix-mixture
    # models (LG4M/LG4X) carry PER-RATE eigen systems: their A/piA SMEM
    # tables arrive as [RK, K] per-rate rows and the query tip as
    # [RK, W, PB] (transform_queries is per-category there).
    K = wA_ref.shape[1]
    RK = tU_ref.shape[0]
    R = RK // K
    Kq = tQ_ref.shape[0]          # K (shared tip) or RK (per-rate tip)

    # All per-pair state is kept 2-D [1, PB]: 1-D (and especially bool)
    # loop carries trip Mosaic layout inference.
    orig = orig_ref[...]                        # [1, PB]
    half = orig * 0.5
    # dead lanes (skip == 1) start "done" in every loop so the lock-step
    # while_loops never wait on their garbage data
    skip = (skip_ref[...] if skip_ref is not None
            else jnp.zeros((1, PB), dtype))

    dist_min = jnp.minimum(BRLEN_MIN / 2.0, half)
    dist_tol = dist_min / 10.0
    dist_max = orig - dist_tol

    # the CTMC's zero eigenvalue sits at state index K-1 (eigh ascending;
    # ops.eigen.decompose snaps it to exactly 0.0), so the j = r*K + (K-1)
    # exponent lanes are exp(0*t) == 1 and their first/second-derivative
    # contributions are exactly zero — skip them statically (None marks an
    # identity exponential)
    def exps(t):  # [1, PB] -> list of RK entries ([1, PB] or None)
        return [None if j % K == K - 1 else jnp.exp(xrk_ref[j, 0] * t)
                for j in range(RK)]

    def emul(x, e):  # x * exp-factor, eliding the identity lanes
        return x if e is None else x * e

    def back_transform(fetch, e, coef_ref):
        """h[r*K+i] = sum_k coef[., k] * fetch(r*K+k) * e[r*K+k]: the
        eigen->state back-transform A @ (u * e^{x t}) done as K^2 FMAs per
        rate with SMEM scalar coefficients. ``coef_ref`` is wA_ref
        ([RK, K] rows [r*K+i, k], rate weight w_r folded in) or A_ref
        ([K, K]). ``fetch(j)`` yields the eigen-space operand tile [W, PB]
        for lane j. Returns RK tiles."""
        per_rate = coef_ref.shape[0] == RK
        h = [None] * RK
        for r in range(R):
            u = [emul(fetch(r * K + k), e[r * K + k]) for k in range(K)]
            for i in range(K):
                acc = None
                for k in range(K):
                    c = (coef_ref[r * K + i, k] if per_rate
                         else coef_ref[i, k])
                    term = c * u[k]
                    acc = term if acc is None else acc + term
                h[r * K + i] = acc
        return h

    def contract_T(hA, hB, out_slices=None):
        """T[j=(r,k)] = sum_i piA[i,k] hA[r,i] hB[r,i] (* out_slices[k]).

        With the factorization G[k1,k2,k3] = sum_i pi_i A_ik1 A_ik2 A_ik3
        the (k1,k2) double contraction collapses to one elementwise product
        in the back-transformed basis plus a K^2 FMA fan-out — ~3x fewer
        [W,PB] tile ops than the direct wG form."""
        prod = [hA[j] * hB[j] for j in range(RK)]
        pi_per_rate = piA_ref.shape[0] == RK and R > 1
        T = [None] * RK
        for r in range(R):
            for k in range(K):
                acc = None
                for i in range(K):
                    c = (piA_ref[r * K + i, k] if pi_per_rate
                         else piA_ref[i, k])
                    term = c * prod[r * K + i]
                    acc = term if acc is None else acc + term
                j = r * K + k
                T[j] = (acc if out_slices is None
                        else acc * out_slices[j % len(out_slices)])
        return T

    def build_T(lp, ld, q_slices):
        """Pendant sumtable T[j=(r,k3)] at edge lengths (lp, ld), with the
        plain query tips folded in (their exponentials ride the Newton
        variable)."""
        hU = back_transform(lambda j: tU_ref[j], exps(lp), wA_ref)
        hV = back_transform(lambda j: tV_ref[j], exps(ld), A_ref)
        return contract_T(hU, hV, q_slices)

    mask = mask_ref[...]
    if pinv_ref is not None:
        pv = pinv_ref[...] * mask                   # [W, PB]
        omp = omp_ref[0, 0]
    else:
        pv = None
        omp = None

    def newton(T, xmin, xmax, xtol, guess):
        """T: list of RK [W,PB] tiles. Bounds/guess [1,PB] (or scalar).

        Safeguard: where d2 >= 0 (no proper maximum) the step slides
        uphill toward a bound; a SECOND consecutive slide in the same
        direction snaps straight TO that bound (carry ``slid``). Without
        the snap a bound-optimum lane approaches geometrically and needs
        ~log2(range/xtol) ~ 30 iterations — and the lock-step block pays
        them for all 128 lanes (measured r05: blocks ran at the
        MAX_ITERS=30 safety bound; with the snap, ~7/solve). The snapped
        length differs from the limit of the slide sequence by < 2*xtol.
        """
        x0 = jnp.clip(guess, xmin, xmax)
        done0 = skip  # 0/1 float mask; dead lanes never gate the loop

        def cond(carry):
            # early exit once every pair in the block converged;
            # MAX_ITERS (30) is only the safety bound
            done, i = carry[1], carry[2]
            return jnp.logical_and(i < MAX_ITERS, jnp.any(done < 1))

        def it(carry):
            x, done, i, slid = carry
            E = exps(x)
            # independent accumulator trees: the f0/f1/f2 reductions over
            # the RK (rate, state) lanes are the iteration's serial
            # dependency chains; splitting each into N_ACC interleaved
            # partial sums exposes N_ACC-way ILP to the VPU at the cost
            # of N_ACC-1 extra adds per reduction (rounding changes are
            # ~1e-6 relative, far under the 1e-4 hardware parity gate)
            n_acc = N_ACC if RK >= 2 * N_ACC else 1
            f0a = [None] * n_acc
            f1a = [None] * n_acc
            f2a = [None] * n_acc

            def acc(lst, a, v):
                lst[a] = v if lst[a] is None else lst[a] + v

            for j in range(RK):
                a = j % n_acc
                tE = emul(T[j], E[j])
                acc(f0a, a, tE)
                if E[j] is None:  # zero-eigenvalue lane: x_j == 0 exactly
                    continue
                xj = xrk_ref[j, 0]
                acc(f1a, a, tE * xj)
                acc(f2a, a, tE * (xj * xj))

            def tree(lst):
                parts = [p for p in lst if p is not None]
                while len(parts) > 1:
                    parts = [parts[i] + parts[i + 1]
                             if i + 1 < len(parts) else parts[i]
                             for i in range(0, len(parts), 2)]
                return (parts[0] if parts
                        else jnp.zeros((W, PB), dtype))

            f0, f1, f2 = tree(f0a), tree(f1a), tree(f2a)
            if pv is None:
                g = jnp.maximum(f0, tiny)
                inv_g = 1.0 / g
                r1 = f1 * inv_g
            else:
                g = jnp.maximum(omp * f0 + pv, tiny)
                inv_g = 1.0 / g
                r1 = omp * f1 * inv_g
                f2 = omp * f2
            d1 = jnp.sum(mask * r1, axis=0, keepdims=True)       # [1, PB]
            d2 = jnp.sum(mask * (f2 * inv_g - r1 * r1), axis=0,
                         keepdims=True)
            newton_x = x - d1 / jnp.where(d2 == 0, 1.0, d2)
            one = jnp.ones_like(x)
            dirn = jnp.where(d1 > 0, one, -one)          # slide direction
            snap = (d2 >= 0) & (slid * dirn > 0)
            bound = jnp.where(d1 > 0, xmax, xmin)  # both broadcast [1,PB]
            slide = jnp.where(
                snap, bound,
                jnp.where(d1 > 0, (x + xmax) / 2, (x + xmin) / 2))
            xn = jnp.clip(jnp.where(d2 < 0, newton_x, slide), xmin, xmax)
            slid_n = jnp.where(d2 < 0, jnp.zeros_like(x), dirn)
            # flat-region stops (ops.newton.GAIN_EPSILON/D1_EPSILON):
            # end the asymptote crawl of garbage pairs that otherwise
            # drags every lock-step block to MAX_ITERS
            conv = ((jnp.abs(xn - x) < xtol)
                    | (jnp.abs(d1) <= D1_EPSILON)
                    | ((d2 < 0) & (d1 * d1 <= GAIN_EPSILON * -d2)))
            xn = jnp.where(done > 0, x, xn)
            done = jnp.maximum(done, conv.astype(dtype))
            return xn, done, i + 1, slid_n

        x, _, trips, _ = jax.lax.while_loop(
            cond, it, (x0, done0, jnp.zeros((), jnp.int32),
                       jnp.zeros((1, PB), dtype)))
        return x, trips

    def score_from(T, lq):
        """Masked log-likelihood from an existing T at pendant length lq."""
        Eq = exps(lq)
        n_acc = N_ACC if RK >= 2 * N_ACC else 1
        fa = [None] * n_acc
        for j in range(RK):
            a = j % n_acc
            v = emul(T[j], Eq[j])
            fa[a] = v if fa[a] is None else fa[a] + v
        f = fa[0]
        for p in fa[1:]:
            f = f + p
        g = jnp.maximum(f if pv is None else omp * f + pv, tiny)
        return jnp.sum(mask * jnp.log(g), axis=0, keepdims=True)  # [1, PB]

    q_plain = [tQ_ref[k] for k in range(Kq)]
    pendant0 = jnp.full((1, PB), DEFAULT_PENDANT, dtype)
    # T is carried across smoothings: the score's T at the accepted lengths
    # IS the next smoothing's pendant sumtable (rolled-back pairs are
    # `done`, so their stale carry is never consumed), saving one full
    # build_T per smoothing.
    T_init = tuple(build_T(half, half, q_plain))
    neg0 = -score_from(T_init, pendant0)

    count = iters_ref is not None

    def smooth_cond(state):
        it, done = state[4], state[5]
        return jnp.logical_and(it < max_smoothings, jnp.any(done < 1))

    def smooth_body(state):
        pendant, distal, proximal, neg_logl, it, done, T1 = state[:7]

        # --- pendant Newton on T1(lp, ld fixed)
        guess = jnp.where((pendant < BRLEN_MIN) | (pendant > BRLEN_MAX),
                          BRLEN_DEFAULT, pendant)
        new_pendant, it1 = newton(T1, BRLEN_MIN, BRLEN_MAX,
                                  BRLEN_MIN / 10.0, guess)

        # --- distal Newton: swap roles (variable = distal side): the
        # trilinear form is symmetric, so T2[j=(r,k2)] contracts the
        # proximal CLV with the pendant-scaled query tips and leaves the
        # plain tV lanes to carry the distal exponentials.
        hU = back_transform(lambda j: tU_ref[j], exps(proximal), wA_ref)
        hQ = back_transform(lambda j: tQ_ref[j % Kq], exps(new_pendant),
                            A_ref)
        T2 = contract_T(hU, hQ)
        for j in range(RK):
            T2[j] = T2[j] * tV_ref[j]

        guess2 = jnp.where((distal < dist_min) | (distal > dist_max),
                           half, distal)
        new_distal, it2 = newton(T2, dist_min, dist_max, dist_tol, guess2)
        new_proximal = orig - new_distal

        T_new = tuple(build_T(new_proximal, new_distal, q_plain))
        new_neg = -score_from(T_new, new_pendant)

        worse = (new_neg - neg_logl) > jnp.abs(new_neg) * 1e-14
        converged = jnp.abs(new_neg - neg_logl) < OPT_BRANCH_EPSILON
        keep = jnp.maximum(worse.astype(dtype), done)
        pendant_out = jnp.where(keep > 0, pendant, new_pendant)
        distal_out = jnp.where(keep > 0, distal, new_distal)
        proximal_out = jnp.where(keep > 0, proximal, new_proximal)
        neg_out = jnp.where(keep > 0, neg_logl, new_neg)
        done_out = jnp.maximum(keep, converged.astype(dtype))
        out = (pendant_out, distal_out, proximal_out, neg_out, it + 1,
               done_out, T_new)
        if count:  # block-level executed-trip accumulator
            out += (state[7] + it1 + it2,)
        return out

    state = (pendant0, half, half, neg0,
             jnp.zeros((), jnp.int32), skip, T_init)
    if count:
        state += (jnp.zeros((), jnp.int32),)
    final = jax.lax.while_loop(smooth_cond, smooth_body, state)
    pendant, distal, proximal, neg_logl, n_smooth, done = final[:6]

    logl_ref[...] = -neg_logl
    pendant_ref[...] = pendant
    distal_ref[...] = distal
    proximal_ref[...] = proximal
    done_ref[...] = done
    if count:
        iters_ref[...] = jnp.full((1, PB), final[7].astype(dtype))
        smooth_ref[...] = jnp.full((1, PB), n_smooth.astype(dtype))


def _g_tensor(A: np.ndarray, freqs: np.ndarray) -> np.ndarray:
    """G[k1,k2,k3] = sum_i pi_i A_ik1 A_ik2 A_ik3."""
    return np.einsum("i,ik,il,im->klm", freqs, A, A, A)


def _kernel_scalars(consts, dtype):
    """SMEM scalar tables for the kernel: exponent lanes x_rk [RK, 1],
    weighted back-transform wA [RK, K] (w_r * A[i,k] rows [r*K+i, k]),
    plain A [K, K], and piA [K, K] (pi_i * A[i,k]). The kernel evaluates
    the trilinear G-form through its factorization
    G[k1,k2,k3] = sum_i pi_i A_ik1 A_ik2 A_ik3. Matrix mixtures
    (per-rate eigen systems) emit PER-RATE [RK, K] rows for all three
    coefficient tables."""
    scale = 1.0 / (1.0 - consts.pinv)   # libpll's +I time scaling
    if consts.A.ndim == 3:
        R, K, _ = consts.A.shape
        RK = R * K
        x_rk = (consts.eigenvals
                * consts.rates[:, None] * scale).reshape(RK, 1)
        wA = (consts.weights[:, None, None] * consts.A).reshape(RK, K)
        A = consts.A.reshape(RK, K)
        piA = (consts.freqs[:, :, None] * consts.A).reshape(RK, K)
        return (jnp.asarray(x_rk, dtype), jnp.asarray(wA, dtype),
                jnp.asarray(A, dtype), jnp.asarray(piA, dtype))
    K = consts.A.shape[0]
    RK = consts.rates.shape[0] * K
    x_rk = (consts.eigenvals[None, :]
            * consts.rates[:, None] * scale).reshape(RK, 1)
    wA = (consts.weights[:, None, None]
          * consts.A[None, :, :]).reshape(RK, K)
    piA = consts.freqs[:, None] * consts.A
    return (jnp.asarray(x_rk, dtype), jnp.asarray(wA, dtype),
            jnp.asarray(consts.A, dtype), jnp.asarray(piA, dtype))


def blo_supported(consts, width: int, sliding: bool = True) -> bool:
    k = int(consts.A.shape[-1])
    rk = k * int(consts.rates.shape[0])
    return (sliding
            and k in (4, 20)
            and width <= max_kernel_sites(rk)
            and consts.A.dtype == jnp.float32)


@functools.partial(jax.jit, static_argnames=("max_smoothings", "interpret",
                                             "has_pinv", "count_iters"))
def blo_optimize_batch_pallas(consts, tU, tV, tQ, ls, site_mask, orig_len,
                              inv_logfreq=None,
                              max_smoothings: int = SMOOTHINGS,
                              interpret: bool = False,
                              has_pinv: bool = False,
                              count_iters: bool = False):
    """Drop-in (sliding-mode) replacement for
    ops.newton.blo_optimize_batch. Inputs as there: tU, tV [B, R*K, W]
    pre-transformed windows; tQ [B, K, W]; ls, site_mask [B, W];
    orig_len [B]. With ``has_pinv`` (the +I models), ``inv_logfreq``
    [B, W] feeds the kernel's linear invariant term (exp(invf - ls));
    otherwise it is accepted for signature parity and ignored (all
    -inf). ``count_iters`` (measurement mode, exclusive with has_pinv)
    appends two per-BLOCK arrays to the return: executed inner-Newton
    trips and executed smoothings per 128-pair block — the lock-step
    loops' true trip counts, feeding the roofline's op model."""
    B, RK, W = tU.shape
    K = tQ.shape[1]
    dtype = tU.dtype

    n_blocks = -(-B // PB)
    NP = n_blocks * PB

    def pad(x):
        if NP == B:
            return x
        widths = [(0, NP - B)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths, mode="edge")

    # kernel layout: pairs on lanes
    tUk = pad(tU).transpose(1, 2, 0)              # [RK, W, NP]
    tVk = pad(tV).transpose(1, 2, 0)
    tQk = pad(tQ).transpose(1, 2, 0)              # [K, W, NP]
    maskk = pad(site_mask).transpose(1, 0)        # [W, NP]
    orig = pad(orig_len)[None, :]                 # [1, NP]

    x_rk, wA, A, piA = _kernel_scalars(consts, dtype)

    grid = (n_blocks,)
    spec3 = lambda d0: pl.BlockSpec((d0, W, PB), lambda p: (0, 0, p),
                                    memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((W, PB), lambda p: (0, p),
                         memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, PB), lambda p: (0, p),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((1, NP), dtype)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    common_specs = [smem, smem, smem,                  # wA, A, piA
                    spec3(RK), spec3(RK),              # tU, tV
                    pl.BlockSpec((K, W, PB), lambda p: (0, 0, p),
                                 memory_space=pltpu.VMEM),  # tQ
                    wspec]                             # mask
    n_out = 7 if count_iters else 5
    if has_pinv:
        assert not count_iters, "count_iters is a plain-kernel probe"
        # linear invariant term in the kernel's scaled space
        pvk = pad(jnp.exp(inv_logfreq - ls)).transpose(1, 0)   # [W, NP]
        omp = (1.0 - consts.pinv).astype(dtype).reshape(1, 1)
        kern = functools.partial(_blo_kernel_pinv,
                                 max_smoothings=max_smoothings)
        in_specs = [smem, smem] + common_specs + [wspec, out_spec]
        args = (x_rk, omp, wA, A, piA, tUk, tVk, tQk, maskk, pvk, orig)
    else:
        kern = functools.partial(
            _blo_kernel_counted if count_iters else _blo_kernel,
            max_smoothings=max_smoothings)
        in_specs = [smem] + common_specs + [out_spec]
        args = (x_rk, wA, A, piA, tUk, tVk, tQk, maskk, orig)

    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=(out_spec,) * n_out,
        out_shape=(out_shape,) * n_out,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    logl, pendant, distal, proximal, done = outs[:5]

    # the kernel scores in scaled space; add back the per-pair log-scale sum
    ls_sum = jnp.sum(site_mask * ls, axis=1)       # [B]
    logl = logl[0, :B] + ls_sum
    pendant = pendant[0, :B]
    distal = distal[0, :B]
    proximal = proximal[0, :B]
    done_b = done[0, :B] > 0
    distal_rep = (orig_len / (distal + proximal)) * distal
    ret = (logl, pendant, distal_rep, distal, proximal, done_b)
    if count_iters:
        # per-block trip counts (constant across each block's 128 lanes)
        ret += (outs[5][0].reshape(n_blocks, PB)[:, 0],
                outs[6][0].reshape(n_blocks, PB)[:, 0])
    return ret


@functools.partial(jax.jit,
                   static_argnames=("block_width", "max_smoothings",
                                    "interpret"))
def blo_optimize_batch_pallas_blocked(consts, tUg, tVg, tQg, mask, orig_len,
                                      offs, ls_sum,
                                      block_width: int,
                                      max_smoothings: int = SMOOTHINGS,
                                      interpret: bool = False,
                                      skip=None, block_active=None,
                                      pinv_lin=None):
    """Per-block site-window variant of :func:`blo_optimize_batch_pallas`.

    tUg, tVg: [NP, RK, S] fast full-row gathers (tU[e_ids]); tQg
    [NP, K, S]; mask [NP, Wb] per-pair site mask RELATIVE to its block's
    window; orig_len [NP]; offs [n_blocks] int32 site offsets (each a
    multiple of 8, offs[p] + Wb <= S); ls_sum [NP] per-pair masked
    log-scale sums (computed full-width by the caller). NP must be a
    multiple of PB; the caller pads (engine/mesh always dispatch
    power-of-two pair counts >= PB).

    ``skip`` [NP] (0/1) marks dead lanes whose outputs are discarded by the
    caller; ``block_active`` [NP/PB] int32 marks blocks with any live pair
    — inactive blocks bypass DMA and compute entirely (the fused step
    sorts heuristic-cut pairs to the tail so whole blocks die).
    ``pinv_lin`` [NP, S] (+I models): per-(pair, site) linear invariant
    term exp(invf - ls), windowed by a 4th per-block DMA.
    """
    NP, RK, S = tUg.shape
    K = tQg.shape[1]
    assert NP % PB == 0, NP
    Wb = block_width
    dtype = tUg.dtype
    n_blocks = NP // PB
    if skip is None:
        skip = jnp.zeros((NP,), dtype)
    if block_active is None:
        block_active = jnp.ones((n_blocks,), jnp.int32)
    skipk = skip.astype(dtype)[None, :]           # [1, NP]

    # pad the site dim so every block window [off, off+Wb) stays in
    # bounds with 8-aligned DMA sizes (plan_blocks plans against the
    # padded width)
    S_pad = max(-(-S // 128) * 128, Wb)
    if S_pad != S:
        padw = [(0, 0), (0, 0), (0, S_pad - S)]
        tUg = jnp.pad(tUg, padw)
        tVg = jnp.pad(tVg, padw)
        tQg = jnp.pad(tQg, padw)
        if pinv_lin is not None:
            pinv_lin = jnp.pad(pinv_lin, padw[1:])

    tUk = tUg.transpose(1, 2, 0)                  # [RK, S_pad, NP]
    tVk = tVg.transpose(1, 2, 0)
    tQk = tQg.transpose(1, 2, 0)                  # [K, S_pad, NP]
    maskk = mask.transpose(1, 0)                  # [Wb, NP]
    orig = orig_len[None, :]                      # [1, NP]

    x_rk, wA, A, piA = _kernel_scalars(consts, dtype)

    out_spec = pl.BlockSpec((1, PB), lambda p, offs, act: (0, p),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((1, NP), dtype)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    any_ = pl.BlockSpec(memory_space=pl.ANY)
    wbspec = pl.BlockSpec((Wb, PB), lambda p, offs, act: (0, p),
                          memory_space=pltpu.VMEM)
    lane = pl.BlockSpec((1, PB), lambda p, offs, act: (0, p),
                        memory_space=pltpu.VMEM)
    if pinv_lin is not None:
        omp = (1.0 - consts.pinv).astype(dtype).reshape(1, 1)
        pvk = pinv_lin.transpose(1, 0)            # [S_pad, NP] (HBM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_blocks,),
            in_specs=[smem, smem, smem, smem, smem,    # xrk,omp,wA,A,piA
                      any_, any_, any_, any_,          # tU,tV,tQ,pinv(HBM)
                      wbspec, lane, lane],             # mask, orig, skip
            out_specs=(out_spec, out_spec, out_spec, out_spec, out_spec),
            scratch_shapes=[
                pltpu.VMEM((RK, Wb, PB), dtype),
                pltpu.VMEM((RK, Wb, PB), dtype),
                pltpu.VMEM((K, Wb, PB), dtype),
                pltpu.VMEM((Wb, PB), dtype),
                pltpu.SemaphoreType.DMA((4,)),
            ],
        )
        kern = functools.partial(_blo_kernel_blocked_pinv,
                                 max_smoothings=max_smoothings)
        args = (offs, block_active, x_rk, omp, wA, A, piA,
                tUk, tVk, tQk, pvk, maskk, orig, skipk)
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,                     # offs, block_active
            grid=(n_blocks,),
            in_specs=[smem, smem, smem, smem,          # xrk, wA, A, piA
                      any_, any_, any_,                # tU, tV, tQ (HBM)
                      wbspec, lane, lane],             # mask, orig, skip
            out_specs=(out_spec, out_spec, out_spec, out_spec, out_spec),
            scratch_shapes=[
                pltpu.VMEM((RK, Wb, PB), dtype),
                pltpu.VMEM((RK, Wb, PB), dtype),
                pltpu.VMEM((K, Wb, PB), dtype),
                pltpu.SemaphoreType.DMA((3,)),
            ],
        )
        kern = functools.partial(_blo_kernel_blocked,
                                 max_smoothings=max_smoothings)
        args = (offs, block_active, x_rk, wA, A, piA,
                tUk, tVk, tQk, maskk, orig, skipk)
    logl, pendant, distal, proximal, done = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(out_shape, out_shape, out_shape, out_shape, out_shape),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(*args)

    logl = logl[0] + ls_sum
    pendant = pendant[0]
    distal = distal[0]
    proximal = proximal[0]
    done_b = done[0] > 0
    distal_rep = (orig_len / (distal + proximal)) * distal
    return logl, pendant, distal_rep, distal, proximal, done_b


def plan_blocks(begins: np.ndarray, spans: np.ndarray, num_sites: int,
                topk: int):
    """Host-side planning for the blocked kernel: given PER-QUERY valid
    ranges (already sorted by begin), compute for each PB-sized pair-block
    (pairs = queries x topk, query-major) the site window offset, and the
    common block width Wb covering every block's spread.

    Returns (offs [n_blocks] int32, Wb int, NP int) where NP is the padded
    pair count (multiple of PB, padding replicates the last pair).
    """
    Q = len(begins)
    B = Q * topk
    n_blocks = -(-B // PB)
    NP = n_blocks * PB
    pair_q = np.repeat(np.arange(Q), topk)
    pair_q = np.concatenate(
        [pair_q, np.repeat(pair_q[-1:], NP - B)])
    offs, Wb = plan_blocks_pairs(begins[pair_q], (begins + spans)[pair_q],
                                 num_sites)
    return offs, Wb, NP


def plan_blocks_pairs(pair_begins: np.ndarray, pair_ends: np.ndarray,
                      num_sites: int):
    """plan_blocks for an explicit PER-PAIR begin/end list whose length is
    already a multiple of PB. Returns (offs [n_blocks] int32, Wb int)."""
    assert len(pair_begins) % PB == 0
    n_blocks = len(pair_begins) // PB
    pb = np.asarray(pair_begins).reshape(n_blocks, PB)
    pe = np.asarray(pair_ends).reshape(n_blocks, PB)
    # offsets at sublane (8-element) granularity. The window width rides
    # the SUBLANE axis of the [W, PB] tiles (pairs are the 128-lane axis),
    # so any multiple of 8 tiles cleanly; but Wb is a static shape in the
    # jitted callers, so its value set must be tiny — a fully
    # data-dependent width made nearly every chunk a fresh ~30s XLA/Mosaic
    # compile. Quarter-octave menu {2^k * (1, 1.25, 1.5, 1.75)} >= 128:
    # at most 4 compile entries per octave, padding waste bounded at 12.5%.
    # Windows are planned against the 128-padded site count — the kernel
    # entry zero-pads the gathered tensors to match.
    s_pad = -(-num_sites // 128) * 128
    offs = (pb.min(axis=1) // 8) * 8
    need = int((pe.max(axis=1) - offs).max())
    Wb = 128
    while Wb < need:
        Wb += max(32, Wb // 4 // 32 * 32)
    if Wb > s_pad:
        Wb = s_pad
    offs = np.clip(offs, 0, s_pad - Wb).astype(np.int32)
    return offs, int(Wb)
