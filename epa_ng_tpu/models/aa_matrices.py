"""Named amino-acid replacement matrix registry.

``MATRICES`` maps model name -> (rates[190], freqs[20]) with amino acids in
the PAML / libpll order ARNDCQEGHILKMFPSTWYV and rates covering the upper
triangle row-major (AR, AN, AD, ..., WY).

Built in: LG, WAG, JTT, DAYHOFF (provenance in epa_ng_tpu.models.aa_data)
plus MTREV, CPREV, MTMAM, RTREV, MTART (transcribed + validated,
epa_ng_tpu.models.aa_data_ext). Everything else is supported through:

- ``PROTGTR{...190 rates...}+FU{...20 freqs...}`` descriptor strings,
- model files from RAxML8 ``-f e`` / raxml-ng / IQ-TREE runs, which embed the
  estimated rates and frequencies (see epa_ng_tpu.io.model_files), and
- ``<NAME>.npz`` files with arrays ``rates`` and ``freqs`` dropped into the
  directory pointed at by ``EPA_NG_TPU_AA_DATA``, registered at import time
  (npz entries override same-named builtins).
"""

from __future__ import annotations

import os

import numpy as np

from epa_ng_tpu.models.aa_data import builtin_matrices
from epa_ng_tpu.models.aa_data_ext import NPZ_ONLY, extended_matrices

MATRICES: dict[str, tuple[np.ndarray, np.ndarray]] = builtin_matrices()
MATRICES.update(extended_matrices())

# Mixture matrices (LG4M/LG4X-style): name -> (components, mixtype) where
# components is a list of (rates[190], freqs[20]) — one per rate category —
# and mixtype is "gamma" (category rates from discrete Gamma, LG4M) or
# "free" (free rates+weights, LG4X). Loaded from npz files whose ``rates`` /
# ``freqs`` arrays are 2-D ([ncomp, 190] / [ncomp, 20]); an optional
# ``mixtype`` entry overrides the default (gamma iff the name ends in "M",
# matching the pll-modules protmix DB convention for LG4M/LG4X).
MIXTURES: dict[str, tuple[list, str]] = {}


def _load_external():
    path = os.environ.get("EPA_NG_TPU_AA_DATA")
    if not path or not os.path.isdir(path):
        return
    for fname in os.listdir(path):
        if not fname.endswith(".npz"):
            continue
        name = fname[:-4].upper()
        data = np.load(os.path.join(path, fname))
        rates = np.asarray(data["rates"], dtype=np.float64)
        freqs = np.asarray(data["freqs"], dtype=np.float64)
        if rates.ndim == 2:
            if (freqs.ndim != 2 or rates.shape[0] != freqs.shape[0]
                    or rates.shape[1] != 190 or freqs.shape[1] != 20):
                raise ValueError(
                    f"{fname}: mixture npz needs rates[n,190], freqs[n,20]")
            if "mixtype" in data:
                mixtype = str(data["mixtype"])
            else:
                mixtype = "gamma" if name.endswith("M") else "free"
            if mixtype not in ("gamma", "free"):
                raise ValueError(f"{fname}: mixtype must be gamma|free")
            MIXTURES[name] = ([
                (rates[i], freqs[i] / freqs[i].sum())
                for i in range(rates.shape[0])], mixtype)
            continue
        if rates.shape != (190,) or freqs.shape != (20,):
            raise ValueError(f"{fname}: expected rates[190] and freqs[20]")
        MATRICES[name] = (rates, freqs / freqs.sum())


_load_external()
