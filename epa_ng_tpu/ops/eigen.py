"""Substitution model -> rate matrix -> symmetric eigendecomposition -> P(t).

TPU-native equivalent of libpll's ``pll_update_eigen`` + ``pll_update_prob_
matrices``: for a reversible model the rate matrix Q (built from
exchangeabilities S and stationary frequencies pi, normalized to mean rate 1)
is similarity-transformed with diag(sqrt(pi)) into a symmetric matrix, whose
eigendecomposition gives

    P(t) = A exp(Lambda * rate_r * t / (1 - pinv)) A^-1,

computed *batched* over edges and rate categories as one einsum, so thousands
of transition matrices materialize in a single fused XLA op instead of the
reference's per-branch loops.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

# TPU matmuls downcast f32 operands to bf16 by default; the chained CLV
# contractions need full f32 precision (bf16 error compounds across ~tree
# depth products and corrupts logls on large trees).
import jax  # noqa: E402
_PP = jax.lax.Precision.HIGHEST


def build_rate_matrix(subst_rates: np.ndarray, freqs: np.ndarray) -> np.ndarray:
    """Q from upper-triangle exchangeabilities (row-major) + frequencies,
    normalized so the expected substitution rate is 1."""
    n = len(freqs)
    S = np.zeros((n, n))
    iu = np.triu_indices(n, k=1)
    S[iu] = subst_rates
    S = S + S.T
    Q = S * freqs[None, :]
    np.fill_diagonal(Q, 0.0)
    np.fill_diagonal(Q, -Q.sum(axis=1))
    # normalize: sum_i pi_i * -Q_ii == 1
    scale = -(freqs * np.diag(Q)).sum()
    return Q / scale


@dataclass
class EigenModel:
    """Eigendecomposition of the (symmetrized) rate matrix plus the
    rate-heterogeneity data needed to produce transition matrices.

    For matrix-mixture models (LG4M/LG4X: one Q per rate category,
    reference src/core/raxml/Model.cpp:154-208) the eigen system is
    per-category: eigenvals [R,K], A/Ainv [R,K,K], freqs [R,K]."""
    eigenvals: np.ndarray    # [K] | [R,K]
    A: np.ndarray            # right eigenvectors, diag(1/sqrt(pi)) W  [K,K] | [R,K,K]
    Ainv: np.ndarray         # W^T diag(sqrt(pi))                      [K,K] | [R,K,K]
    freqs: np.ndarray        # [K] | [R,K]
    rates: np.ndarray        # rate category rates [R]
    weights: np.ndarray      # rate category weights [R]
    pinv: float

    @property
    def mixture(self) -> bool:
        return self.A.ndim == 3

    @property
    def num_states(self) -> int:
        return self.freqs.shape[-1]

    @property
    def num_rates(self) -> int:
        return len(self.rates)


def _decompose_one(subst_rates: np.ndarray, freqs: np.ndarray):
    """(eigenvals [K], A [K,K], Ainv [K,K]) for one Q matrix."""
    Q = build_rate_matrix(np.asarray(subst_rates, np.float64), freqs)
    sqrt_pi = np.sqrt(freqs)
    B = sqrt_pi[:, None] * Q / sqrt_pi[None, :]
    B = (B + B.T) / 2  # clean numerical asymmetry
    eigvals, W = np.linalg.eigh(B)
    # a CTMC generator has one zero eigenvalue (the stationary mode) and
    # the rest negative; eigh returns ascending order, so the last entry
    # is the zero one up to rounding. Snap it exactly: exp(0*t) == 1 then
    # holds bit-exactly, and the Pallas Newton kernel statically skips the
    # zero-exponent lanes (ops.pallas_blo._blo_compute).
    if not (eigvals[-1] > -1e-8 and abs(eigvals[-1]) < 1e-8):
        raise ValueError(
            f"rate matrix eigenvalues not CTMC-like: {eigvals}")
    eigvals[-1] = 0.0
    A = W / sqrt_pi[:, None]
    Ainv = W.T * sqrt_pi[None, :]
    return eigvals, A, Ainv


def decompose(model) -> EigenModel:
    """EigenModel from an epa_ng_tpu.models.Model."""
    rates = np.asarray(model.ratecat_rates, np.float64)
    weights = np.asarray(model.ratecat_weights, np.float64)
    if getattr(model, "submodels", None):
        # matrix mixture: one eigen system per rate category, each Q
        # individually normalized to mean rate 1 (pll protmix semantics)
        evs, As, Ainvs, fqs = [], [], [], []
        for sub_rates, sub_freqs in model.submodels:
            f = np.asarray(sub_freqs, np.float64)
            ev, A, Ainv = _decompose_one(sub_rates, f)
            evs.append(ev); As.append(A); Ainvs.append(Ainv); fqs.append(f)
        return EigenModel(
            eigenvals=np.stack(evs), A=np.stack(As), Ainv=np.stack(Ainvs),
            freqs=np.stack(fqs), rates=rates, weights=weights,
            pinv=float(model.pinv))
    freqs = np.asarray(model.base_freqs, dtype=np.float64)
    eigvals, A, Ainv = _decompose_one(model.subst_rates, freqs)
    return EigenModel(
        eigenvals=eigvals, A=A, Ainv=Ainv, freqs=freqs,
        rates=rates, weights=weights, pinv=float(model.pinv))


def pmatrices(eig: EigenModel, lengths, dtype=jnp.float64) -> jnp.ndarray:
    """Transition matrices for a batch of branch lengths: [..., R, K, K].

    ``lengths`` may be any shape; rate categories broadcast in. Matches
    libpll's p-inv convention of scaling time by 1/(1-pinv)
    (pll kernel equivalent: core_pmatrix).
    """
    lengths = jnp.asarray(lengths, dtype=dtype)
    rates = jnp.asarray(eig.rates, dtype=dtype)
    scale = 1.0 - eig.pinv
    # t'[..., r] = t * rate_r / (1 - pinv)
    t = lengths[..., None] * rates / scale
    ev = jnp.asarray(eig.eigenvals, dtype=dtype)
    A = jnp.asarray(eig.A, dtype=dtype)
    Ainv = jnp.asarray(eig.Ainv, dtype=dtype)
    if eig.mixture:
        expd = jnp.exp(t[..., None] * ev)           # [..., R, K] (ev [R,K])
        P = jnp.einsum("rik,...rk,rkj->...rij", A, expd, Ainv, precision=_PP)
    else:
        expd = jnp.exp(t[..., None] * ev)           # [..., R, K]
        # P = A @ diag(expd) @ Ainv
        P = jnp.einsum("ik,...k,kj->...ij", A, expd, Ainv, precision=_PP)
    # guard tiny negatives from round-off (probabilities)
    return jnp.maximum(P, 0.0)
