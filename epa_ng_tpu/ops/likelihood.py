"""Edge log-likelihood evaluation (the analog of
``pll_compute_edge_loglikelihood``) as batched contractions.

CLVs carry per-(site, rate) log scales (see ops.clv); the rate-category
mixture is therefore computed with a per-site max-shift over categories:

    logL_s = m_s + log( sum_r w_r c_sr exp(ls_sr - m_s) ),  m_s = max_r ls_sr

All functions broadcast over arbitrary leading batch dimensions; the
site-dimension reduction accepts a per-site weight/mask vector which realizes
the reference's per-query valid-range focus (src/core/pll/pll_util.cpp:388)
as masked arithmetic instead of pointer shifting.
"""

from __future__ import annotations

import jax.numpy as jnp

# TPU matmuls downcast f32 operands to bf16 by default; the chained CLV
# contractions need full f32 precision (bf16 error compounds across ~tree
# depth products and corrupts logls on large trees).
import jax  # noqa: E402
_PP = jax.lax.Precision.HIGHEST


def edge_logl_persite(U, lsU, V, lsV, P, freqs, weights, pinv=0.0,
                      inv_logterm=None):
    """Per-site log-likelihood at an edge: [..., S].

    U, V: [..., R, K, S]; lsU, lsV: [..., R, S]; P: [..., R, K, K].
    ``freqs``: [K], or [R, K] for matrix-mixture models (per-category
    stationary frequencies). ``inv_logterm``: [S] log(pinv * pi_invstate)
    with -inf at non-invariant sites (pass None when pinv == 0).
    """
    PV = jnp.einsum("...rij,...rjs->...ris", P, V, precision=_PP)
    if freqs.ndim == 2:
        c = jnp.einsum("...ris,...ris,ri->...rs", U, PV, freqs, precision=_PP)
    else:
        c = jnp.einsum("...ris,...ris,i->...rs", U, PV, freqs, precision=_PP)  # per-rate lk
    ls = lsU + lsV                                          # [..., R, S]
    m = jnp.max(ls, axis=-2)                                # [..., S]
    L = jnp.einsum("...rs,r->...s", c * jnp.exp(ls - m[..., None, :]), weights, precision=_PP)
    L = jnp.maximum(L, jnp.finfo(L.dtype).tiny)
    logL = jnp.log(L) + m
    if inv_logterm is not None:
        logL = jnp.logaddexp(jnp.log1p(-pinv) + logL, inv_logterm)
    return logL


def edge_loglikelihood(U, lsU, V, lsV, P, freqs, weights, pinv=0.0,
                       inv_logterm=None, site_mask=None):
    """Total log-likelihood at an edge: [...]. ``site_mask`` ([..., S] or
    [S]) weights each site's contribution (1 = in range)."""
    logL = edge_logl_persite(U, lsU, V, lsV, P, freqs, weights, pinv,
                             inv_logterm)
    if site_mask is not None:
        logL = logL * site_mask
    return jnp.sum(logL, axis=-1)


def asc_bias_correction(inv_logls, kind: str, weights, n_real_sites):
    """Ascertainment-bias log-likelihood correction term (added to the
    uncorrected total logl).

    ``inv_logls``: [K] log-likelihood of the K dummy invariant columns
    (state k at every tip). ``weights``: [K] per-state invariant-site
    counts (felsenstein uses only their sum; lewis ignores them).
    ``n_real_sites``: total weight of the observed (variable) sites.

    - lewis (Lewis 2001): condition on variability,
      correction = -W * log(1 - sum_k L_k).
    - felsenstein: add back w invariant sites of unknown state,
      correction = w * log(sum_k L_k).
    - stamatakis: add back per-state invariant-site counts,
      correction = sum_k w_k * log(L_k).

    The reference parses these into its Model (src/core/raxml/Model.cpp:
    268-296) but never wires them into the placement partition
    (assign(partition, model), Model.cpp:712-734, sets freqs/rates/pinv
    only), so placement scores are unaffected there and here; this term
    applies to reference-tree evaluation (--opt-model).
    """
    probs = jnp.exp(inv_logls)
    if kind == "lewis":
        return -n_real_sites * jnp.log1p(-jnp.sum(probs))
    if kind == "felsenstein":
        return jnp.sum(weights) * jnp.log(jnp.sum(probs))
    if kind == "stamatakis":
        return jnp.sum(weights * inv_logls)
    raise ValueError(f"unknown ascertainment bias correction: {kind}")


def make_inv_logterm(inv_state, freqs, pinv, dtype=jnp.float64):
    """[S] log(pinv * pi_inv(s)), -inf where the site is not invariant."""
    import numpy as np
    if pinv <= 0.0:
        return None
    freqs = np.asarray(freqs)
    out = np.full(inv_state.shape, -np.inf)
    ok = inv_state >= 0
    out[ok] = np.log(pinv * freqs[inv_state[ok]])
    return jnp.asarray(out, dtype=dtype)
