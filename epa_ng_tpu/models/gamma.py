"""Discrete Gamma rate-heterogeneity categories (Yang 1994).

Equivalent of libpll's ``pll_compute_gamma_cats`` in both modes:
- mean: category rate = mean of the Gamma density over each of K equiprobable
  quantile bins (computed via the incomplete gamma function),
- median: category rate = median of each bin, rescaled to mean 1.

Uses scipy's regularized incomplete gamma instead of the PAML series
approximations; agreement is well below 1e-10.
"""

from __future__ import annotations

import numpy as np
from scipy.special import gammainc, gammaincinv

GAMMA_RATES_MEAN = "mean"
GAMMA_RATES_MEDIAN = "median"


def discrete_gamma_rates(alpha: float, categories: int,
                         mode: str = GAMMA_RATES_MEAN) -> np.ndarray:
    if categories < 1:
        raise ValueError("need at least one rate category")
    if categories == 1:
        return np.ones(1)
    k = categories
    beta = alpha  # mean-1 parameterization
    if mode == GAMMA_RATES_MEAN:
        # cut points at quantiles i/k of Gamma(alpha, beta)
        probs = np.arange(1, k) / k
        cuts = gammaincinv(alpha, probs) / beta
        # mean of each bin: (alpha/beta) * [I(cut_hi*beta; a+1) - I(cut_lo*beta; a+1)] * k
        upper = np.concatenate([gammainc(alpha + 1.0, cuts * beta), [1.0]])
        lower = np.concatenate([[0.0], gammainc(alpha + 1.0, cuts * beta)])
        rates = (upper - lower) * (alpha / beta) * k
    elif mode == GAMMA_RATES_MEDIAN:
        probs = (2.0 * np.arange(k) + 1.0) / (2.0 * k)
        rates = gammaincinv(alpha, probs) / beta
        rates *= k / rates.sum()  # rescale to mean exactly 1
    else:
        raise ValueError(f"unknown gamma mode: {mode}")
    return rates
