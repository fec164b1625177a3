"""Evolutionary model container + raxml-ng descriptor-string parsing.

Re-implements the semantics of the reference's vendored raxml-ng Model
(reference: src/core/raxml/Model.cpp:114-538): model name -> substitution
rate symmetries/fixed rates, then options:

    {r1/r2/...}      user substitution rates (normalized by the last one)
    +F[C|O|E|U{..}]  frequencies: empirical / ML / equal / user
    +I[O|C|U{..}]    proportion of invariant sites
    +G[n][a|m][{a}]  discrete Gamma, n categories, median/mean, alpha
    +R n {r}{w}      free rates

DNA state order ACGT, rate order AC AG AT CG CT GT; protein order
ARNDCQEGHILKMFPSTWYV (190 rates, upper triangle row-major).
"""

from __future__ import annotations

import enum
import re
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from epa_ng_tpu.models.gamma import (GAMMA_RATES_MEAN, GAMMA_RATES_MEDIAN,
                                     discrete_gamma_rates)


class DataType(enum.Enum):
    AUTODETECT = "autodetect"
    DNA = "dna"
    PROTEIN = "protein"
    BINARY = "binary"
    DIPLOID10 = "diploid10"


DATATYPE_STATES = {DataType.DNA: 4, DataType.PROTEIN: 20,
                   DataType.BINARY: 2, DataType.DIPLOID10: 10}


class ParamValue(enum.Enum):
    UNDEFINED = 0
    EQUAL = 1
    USER = 2
    MODEL = 3
    EMPIRICAL = 4
    ML = 5


def _n_rates(states: int) -> int:
    return states * (states - 1) // 2


# --- DNA model database (name -> (rate symmetry string, equal_freqs)) -------
# symmetry over rate order AC AG AT CG CT GT; equal_freqs=True means the model
# fixes frequencies to 1/4 (otherwise they default to ML / can be overridden).
_DNA_MODELS = {
    "JC":      ("000000", True),
    "K80":     ("010010", True),
    "F81":     ("000000", False),
    "HKY":     ("010010", False),
    "TN93EF":  ("010020", True),
    "TN93":    ("010020", False),
    "K81":     ("012210", True),
    "K81UF":   ("012210", False),
    "TPM2":    ("121020", True),
    "TPM2UF":  ("121020", False),
    "TPM3":    ("120120", True),
    "TPM3UF":  ("120120", False),
    "TIM1":    ("012230", True),
    "TIM1UF":  ("012230", False),
    "TIM2":    ("121030", True),
    "TIM2UF":  ("121030", False),
    "TIM3":    ("120130", True),
    "TIM3UF":  ("120130", False),
    "TVMEF":   ("120121", True),
    "TVM":     ("120121", False),
    "SYM":     ("012345", True),
    "GTR":     ("012345", False),
}

# --- unphased-genotype (10-state) model database -----------------------------
# name -> DNA-level symmetry string over the 6 base-pair rates (AC AG AT CG
# CT GT); expanded to the 45 genotype exchangeabilities by _gt_expand. GTGTR
# (all 45 free) is handled separately. State order follows the reference's
# pll_map_diploid10 (src/core/raxml/Model.cpp:36-56).
_GT_MODELS = {
    "GTJC":    ("000000", True),
    "GTHKY4":  ("010010", False),
    "GTGTR4":  ("012345", False),
}

# upper-triangle (i<j) pair order for the 45 genotype rates
from epa_ng_tpu.models.charmaps import GT_STATES as _GT_STATES

_DNA_PAIR_INDEX = {p: i for i, p in enumerate(
    ("AC", "AG", "AT", "CG", "CT", "GT"))}


def _gt_expand(dna_rates: np.ndarray) -> np.ndarray:
    """Expand the 6 DNA exchangeabilities to the 45 genotype rates: two
    genotypes exchanging at rate r_xy iff they differ in exactly one allele
    (x -> y); structurally 0 otherwise (the CellPhy/raxml-ng GT10 model)."""
    n = len(_GT_STATES)
    out = []
    for i in range(n):
        for j in range(i + 1, n):
            a = sorted(_GT_STATES[i])
            b = sorted(_GT_STATES[j])
            # multiset difference
            rem_a, rem_b = list(a), list(b)
            for ch in a:
                if ch in rem_b:
                    rem_b.remove(ch)
                    rem_a.remove(ch)
            if len(rem_a) == 1:
                pair = "".join(sorted(rem_a + rem_b))
                out.append(dna_rates[_DNA_PAIR_INDEX[pair]])
            else:
                out.append(0.0)
    return np.asarray(out, dtype=np.float64)


# --- protein named-matrix registry ------------------------------------------
# name -> (rates[190], freqs[20]); populated lazily from
# epa_ng_tpu.models.aa_matrices. PROTGTR (free rates) always works.
def _aa_registry() -> dict:
    from epa_ng_tpu.models import aa_matrices
    return aa_matrices.MATRICES


def _aa_mixtures() -> dict:
    from epa_ng_tpu.models import aa_matrices
    return aa_matrices.MIXTURES


# All protein model names the reference's pll-modules DB resolves
# (pllmod_util_model_info_protein): used for data-type autodetection so an
# unregistered-but-known name yields a protein-specific error pointing at
# the npz registry instead of a generic "invalid model".
_KNOWN_AA_NAMES = frozenset({
    "DAYHOFF", "LG", "DCMUT", "JTT", "MTREV", "WAG", "RTREV", "CPREV",
    "VT", "BLOSUM62", "MTMAM", "MTART", "MTZOA", "PMB", "HIVB", "HIVW",
    "JTT-DCMUT", "JTTDCMUT", "FLU", "STMTREV", "LG4M", "LG4X", "PROTGTR",
})


class ModelError(ValueError):
    pass


@dataclass
class Model:
    name: str = "GTR"
    data_type: DataType = DataType.AUTODETECT
    num_states: int = 4
    subst_rates: np.ndarray = None      # full rate vector (6 or 190)
    base_freqs: np.ndarray = None       # [states]
    # mixture models (LG4M/LG4X): one (rates[190], freqs[20]) per rate
    # category; when set, subst_rates/base_freqs mirror component 0 and
    # num_ratecats == len(submodels) (reference: src/core/raxml/Model.cpp:
    # 154-208 init_mix_model / _submodels)
    submodels: Optional[list] = None
    rate_sym: Optional[str] = None      # symmetry string (DNA custom models)
    gt_dna_sym: Optional[str] = None    # genotype models: DNA-level symmetry
    alpha: float = 1.0
    pinv: float = 0.0
    num_ratecats: int = 1
    gamma_mode: str = GAMMA_RATES_MEAN
    ratecat_rates: np.ndarray = None
    ratecat_weights: np.ndarray = None
    rate_het: str = "fixed"             # "fixed" | "gamma" | "free"
    freqs_mode: ParamValue = ParamValue.ML
    rates_mode: ParamValue = ParamValue.ML
    pinv_mode: ParamValue = ParamValue.UNDEFINED
    alpha_mode: ParamValue = ParamValue.UNDEFINED
    # ascertainment-bias correction: None | "lewis" | "felsenstein" |
    # "stamatakis" (reference: src/core/raxml/Model.cpp:268-296); weights
    # are the per-state invariant-site counts ([0] only for felsenstein)
    ascbias_type: Optional[str] = None
    ascbias_weights: Optional[np.ndarray] = None

    # -- construction ------------------------------------------------------

    @classmethod
    def from_string(cls, model_string: str,
                    data_type: DataType = DataType.AUTODETECT) -> "Model":
        if model_string == "DNA":  # RAxML compatibility alias
            model_string = "GTR+G+F"
        m = re.search(r"[+{\[]", model_string)
        name = model_string[:m.start()] if m else model_string
        opts = model_string[m.start():] if m else ""
        name_u = name.upper()

        model = cls()
        model.name = name_u

        if data_type == DataType.AUTODETECT:
            if name_u in _GT_MODELS or name_u == "GTGTR":
                data_type = DataType.DIPLOID10
            elif name_u == "BIN":
                data_type = DataType.BINARY
            elif name_u in _DNA_MODELS:
                data_type = DataType.DNA
            elif (name_u in _KNOWN_AA_NAMES or name_u in _aa_registry()
                  or name_u in _aa_mixtures()):
                data_type = DataType.PROTEIN
            else:
                raise ModelError(f"Invalid model name: {name}")
        model.data_type = data_type
        model.num_states = DATATYPE_STATES[data_type]
        nr = _n_rates(model.num_states)

        equal_freqs_model = False
        if data_type == DataType.DNA:
            if name_u not in _DNA_MODELS:
                raise ModelError(f"Invalid model name: {name}")
            sym, equal_freqs_model = _DNA_MODELS[name_u]
            model.rate_sym = sym
            model.rates_mode = ParamValue.ML
            model.subst_rates = _expand_sym(sym, None)
        elif data_type == DataType.BINARY:
            if name_u != "BIN":
                raise ModelError(f"Invalid model name: {name}")
            model.rates_mode = ParamValue.ML
            model.subst_rates = np.asarray([1.0])
        elif data_type == DataType.DIPLOID10:
            if name_u == "GTGTR":
                # general 10-state GTR: all 45 exchangeabilities free
                model.gt_dna_sym = None
                model.rates_mode = ParamValue.ML
                model.subst_rates = np.full(nr, 0.5)
                model.subst_rates[-1] = 1.0
            elif name_u in _GT_MODELS:
                sym, equal_freqs_model = _GT_MODELS[name_u]
                model.gt_dna_sym = sym
                model.rates_mode = ParamValue.ML
                model.subst_rates = _gt_expand(_expand_sym(sym, None))
            else:
                raise ModelError(f"Invalid model name: {name}")
        else:
            if name_u == "PROTGTR":
                model.rate_sym = None
                model.rates_mode = ParamValue.ML
                model.subst_rates = np.full(nr, 0.5)
                model.subst_rates[-1] = 1.0
            elif name_u in _aa_mixtures():
                # per-rate-category matrix mixture (LG4M/LG4X-style):
                # one Q matrix per category; LG4M couples the category
                # rates to discrete Gamma, LG4X uses free rates+weights
                # (reference: Model.cpp:154-208, pll-modules protmix DB)
                comps, mixtype = _aa_mixtures()[name_u]
                model.submodels = [(np.asarray(r, np.float64),
                                    np.asarray(f, np.float64))
                                   for r, f in comps]
                model.num_ratecats = len(comps)
                model.rate_het = mixtype
                model.subst_rates = model.submodels[0][0]
                model.base_freqs = model.submodels[0][1]
                model.rates_mode = ParamValue.MODEL
                model.freqs_mode = ParamValue.MODEL
            else:
                reg = _aa_registry()
                if name_u not in reg:
                    hint = (" (a known pll model name — convert its "
                            "published table with tools/make_aa_npz.py "
                            "and set EPA_NG_TPU_AA_DATA to the npz dir)"
                            if name_u in _KNOWN_AA_NAMES else "")
                    raise ModelError(
                        f"Invalid or unavailable protein model: {name}{hint}. "
                        f"Available: PROTGTR, {', '.join(sorted(reg))}")
                rates, freqs = reg[name_u]
                model.subst_rates = np.asarray(rates, dtype=np.float64)
                model.base_freqs = np.asarray(freqs, dtype=np.float64)
                model.rates_mode = ParamValue.MODEL
                model.freqs_mode = ParamValue.MODEL

        model._parse_opts(opts, equal_freqs_model)
        model._finalize(equal_freqs_model)
        return model

    def _parse_opts(self, opts: str, equal_freqs_model: bool):
        s = _Scanner(opts)
        # optional leading user rates
        rates = s.maybe_params()
        if rates is not None:
            self._set_user_rates(np.asarray(rates))
            self.rates_mode = ParamValue.USER
        while not s.eof():
            c = s.get()
            if c == "+":
                continue
            cu = c.upper()
            if cu == "F":
                nxt = s.peek()
                if nxt is None or nxt == "+":
                    self.freqs_mode = ParamValue.EMPIRICAL
                elif nxt.upper() == "C":
                    s.get(); self.freqs_mode = ParamValue.EMPIRICAL
                elif nxt.upper() == "O":
                    s.get(); self.freqs_mode = ParamValue.ML
                elif nxt.upper() == "E":
                    s.get(); self.freqs_mode = ParamValue.EQUAL
                elif nxt.upper() == "U":
                    s.get()
                    freqs = s.maybe_params()
                    if freqs is None:
                        raise ModelError("Invalid frequencies specification")
                    freqs = np.asarray(freqs, dtype=np.float64)
                    if len(freqs) != self.num_states:
                        raise ModelError(
                            f"Invalid number of user frequencies specified: "
                            f"{len(freqs)} (expected {self.num_states})")
                    if (freqs <= 0).any() or (freqs >= 1).any():
                        raise ModelError("Invalid base frequencies specified!")
                    self.base_freqs = freqs / freqs.sum()
                    self.freqs_mode = ParamValue.USER
                elif nxt == "{":
                    # bare +F{...} == user freqs (raxml8 style)
                    freqs = np.asarray(s.maybe_params(), dtype=np.float64)
                    self.base_freqs = freqs / freqs.sum()
                    self.freqs_mode = ParamValue.USER
                else:
                    raise ModelError(f"Invalid frequencies specification: F{nxt}")
            elif cu == "I":
                nxt = s.peek()
                if nxt is None or nxt == "+":
                    self.pinv_mode = ParamValue.ML
                elif nxt.upper() == "O":
                    s.get(); self.pinv_mode = ParamValue.ML
                elif nxt.upper() == "C":
                    s.get(); self.pinv_mode = ParamValue.EMPIRICAL
                elif nxt.upper() == "U":
                    s.get()
                    v = s.maybe_params()
                    if v is None:
                        raise ModelError("Invalid p-inv specification")
                    self.pinv = float(v[0])
                    self.pinv_mode = ParamValue.USER
                elif nxt == "{":
                    v = s.maybe_params()
                    self.pinv = float(v[0])
                    self.pinv_mode = ParamValue.USER
                else:
                    raise ModelError(f"Invalid p-inv specification: I{nxt}")
            elif cu == "G":
                self.rate_het = "gamma"
                num = s.maybe_int()
                self.num_ratecats = num if num else (
                    4 if self.num_ratecats == 1 else self.num_ratecats)
                nxt = s.peek()
                if nxt and nxt in "aA":
                    s.get(); self.gamma_mode = GAMMA_RATES_MEDIAN
                elif nxt and nxt in "mM":
                    s.get(); self.gamma_mode = GAMMA_RATES_MEAN
                v = s.maybe_params()
                if v is not None:
                    self.alpha = float(v[0])
                    self.alpha_mode = ParamValue.USER
            elif cu == "R":
                self.rate_het = "free"
                num = s.maybe_int()
                self.num_ratecats = num if num else (
                    4 if self.num_ratecats == 1 else self.num_ratecats)
                v = s.maybe_params()
                if v is not None:
                    rates = np.asarray(v, dtype=np.float64)
                    if len(rates) != self.num_ratecats:
                        raise ModelError("Invalid number of free rates specified")
                    w = s.maybe_params()
                    if w is not None:
                        weights = np.asarray(w, dtype=np.float64)
                        weights = weights / weights.sum()
                    else:
                        weights = np.full(self.num_ratecats,
                                          1.0 / self.num_ratecats)
                    rates = rates / (rates * weights).sum()
                    self.ratecat_rates = rates
                    self.ratecat_weights = weights
            elif cu == "A":
                # +ASC_LEWIS | +ASC_FELS{w} | +ASC_STAM{w1/../wK}
                # (reference grammar: src/core/raxml/Model.cpp:268-296)
                rest = "A" + s.read_option()
                if rest == "ASC_LEWIS":
                    self.ascbias_type = "lewis"
                elif rest == "ASC_FELS":
                    v = s.maybe_params()
                    if v is None or len(v) != 1:
                        raise ModelError(
                            "Invalid ascertainment bias correction "
                            f"specification: +{rest}")
                    w = np.zeros(self.num_states, dtype=np.float64)
                    w[0] = float(v[0])
                    self.ascbias_type = "felsenstein"
                    self.ascbias_weights = w
                elif rest == "ASC_STAM":
                    v = s.maybe_params()
                    if v is None or len(v) != self.num_states:
                        raise ModelError(
                            "Invalid ascertainment bias correction "
                            f"specification: +{rest}")
                    self.ascbias_type = "stamatakis"
                    self.ascbias_weights = np.asarray(v, dtype=np.float64)
                else:
                    raise ModelError(
                        "Invalid ascertainment bias correction "
                        f"specification: +{rest}")
            else:
                raise ModelError(f"Wrong model specification near: {c}{opts}")

    def _set_user_rates(self, user_rates: np.ndarray):
        if self.submodels is not None:
            raise ModelError(
                "User substitution rates cannot override a mixture model's "
                "per-category matrices")
        nr = _n_rates(self.num_states)
        if self.data_type == DataType.DIPLOID10 and self.gt_dna_sym is not None:
            # user supplies the DNA-level rates (as many as the model's
            # unique base-pair rates, or the full 6); expand to the 45
            # genotype exchangeabilities
            sym = self.gt_dna_sym
            n_uniq = len(set(sym))
            if len(user_rates) == 6 and n_uniq != 6:
                dna6 = np.asarray(user_rates, dtype=np.float64)
            elif len(user_rates) != n_uniq:
                raise ModelError(
                    f"Invalid number of substitution rates specified: "
                    f"{len(user_rates)} (expected: {n_uniq})")
            else:
                dna6 = _expand_sym(sym, np.asarray(user_rates, np.float64))
            self.subst_rates = _gt_expand(dna6 / dna6[-1])
            return
        sym = self.rate_sym
        if sym is not None:
            n_uniq = len(set(sym))
            if len(user_rates) == nr and n_uniq != nr:
                # full vector given for a constrained model: accept as-is
                rates = np.asarray(user_rates, dtype=np.float64)
                last = rates[-1]
            elif len(user_rates) != n_uniq:
                raise ModelError(
                    f"Invalid number of substitution rates specified: "
                    f"{len(user_rates)} (expected: {n_uniq})")
            else:
                last = user_rates[int(sym[-1])]
                rates = _expand_sym(sym, np.asarray(user_rates, np.float64))
        else:
            if len(user_rates) != nr:
                raise ModelError(
                    f"Invalid number of substitution rates specified: "
                    f"{len(user_rates)} (expected: {nr})")
            rates = np.asarray(user_rates, dtype=np.float64)
            last = rates[-1]
        self.subst_rates = rates / last

    def _finalize(self, equal_freqs_model: bool):
        n = self.num_states
        if self.ascbias_type is not None and (
                self.pinv > 0 or self.pinv_mode != ParamValue.UNDEFINED):
            # libpll cannot combine ASC with a proportion of invariant
            # sites (an ASC-corrected model asserts no invariant sites)
            raise ModelError(
                "Ascertainment bias correction (+ASC_*) cannot be combined "
                "with a proportion of invariant sites (+I)")
        if self.submodels is not None:
            if self.num_ratecats != len(self.submodels):
                raise ModelError(
                    f"Mixture model {self.name} has {len(self.submodels)} "
                    f"components but {self.num_ratecats} rate categories "
                    "were specified (they must match)")
            if self.freqs_mode not in (ParamValue.MODEL,):
                raise ModelError(
                    "Frequency options cannot override a mixture model's "
                    "per-category frequencies")
        if equal_freqs_model:
            self.freqs_mode = ParamValue.MODEL
            self.base_freqs = np.full(n, 1.0 / n)
        if self.base_freqs is None:
            self.base_freqs = np.full(n, 1.0 / n)
        if self.subst_rates is None:
            nr = _n_rates(n)
            self.subst_rates = np.full(nr, 0.5)
            self.subst_rates[-1] = 1.0
        if self.ratecat_rates is None:
            if self.num_ratecats > 1 and self.rate_het == "gamma":
                self.ratecat_rates = discrete_gamma_rates(
                    self.alpha, self.num_ratecats, self.gamma_mode)
                if self.alpha_mode == ParamValue.UNDEFINED:
                    self.alpha_mode = ParamValue.ML
            else:
                self.ratecat_rates = np.ones(self.num_ratecats)
        if self.ratecat_weights is None:
            self.ratecat_weights = np.full(self.num_ratecats,
                                           1.0 / self.num_ratecats)

    # -- queries -----------------------------------------------------------

    @property
    def empirical_base_freqs(self) -> bool:
        return self.freqs_mode == ParamValue.EMPIRICAL

    def set_alpha(self, alpha: float):
        self.alpha = alpha
        if self.rate_het == "gamma" and self.num_ratecats > 1:
            self.ratecat_rates = discrete_gamma_rates(
                alpha, self.num_ratecats, self.gamma_mode)

    def to_string(self) -> str:
        parts = [self.name]
        if self.rates_mode == ParamValue.USER:
            parts.append("{" + "/".join(_fmt(v) for v in self.subst_rates) + "}")
        fm = {ParamValue.EMPIRICAL: "+FC", ParamValue.ML: "+FO",
              ParamValue.EQUAL: "+FE"}.get(self.freqs_mode)
        if fm:
            parts.append(fm)
        elif self.freqs_mode == ParamValue.USER:
            parts.append("+FU{" + "/".join(_fmt(v) for v in self.base_freqs) + "}")
        if self.pinv_mode == ParamValue.USER:
            parts.append("+IU{" + _fmt(self.pinv) + "}")
        elif self.pinv_mode == ParamValue.ML:
            parts.append("+I")
        if self.num_ratecats > 1 and self.rate_het == "gamma":
            parts.append(f"+G{self.num_ratecats}"
                         f"{'a' if self.gamma_mode == GAMMA_RATES_MEDIAN else 'm'}")
            if self.alpha_mode == ParamValue.USER:
                parts.append("{" + _fmt(self.alpha) + "}")
        if self.ascbias_type == "lewis":
            parts.append("+ASC_LEWIS")
        elif self.ascbias_type == "felsenstein":
            parts.append("+ASC_FELS{" + _fmt(self.ascbias_weights[0]) + "}")
        elif self.ascbias_type == "stamatakis":
            parts.append("+ASC_STAM{"
                         + "/".join(_fmt(v) for v in self.ascbias_weights)
                         + "}")
        return "".join(parts)


def _fmt(v: float) -> str:
    return f"{v:g}"


def _expand_sym(sym: str, uniq: Optional[np.ndarray]) -> np.ndarray:
    """Expand a symmetry string (e.g. '010010') + unique rates to the full
    rate vector; with uniq=None produce the default start vector (0.5 / 1)."""
    n_uniq = max(int(c) for c in sym) + 1
    if uniq is None:
        uniq = np.full(n_uniq, 0.5)
        uniq[int(sym[-1])] = 1.0
    return np.asarray([uniq[int(c)] for c in sym], dtype=np.float64)


class _Scanner:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def eof(self) -> bool:
        return self.i >= len(self.s)

    def peek(self) -> Optional[str]:
        return self.s[self.i] if self.i < len(self.s) else None

    def get(self) -> str:
        c = self.s[self.i]
        self.i += 1
        return c

    def read_option(self) -> str:
        out = []
        while not self.eof() and self.peek() not in "{+":
            out.append(self.get())
        return "".join(out)

    def maybe_int(self) -> Optional[int]:
        out = []
        while not self.eof() and self.peek().isdigit():
            out.append(self.get())
        return int("".join(out)) if out else None

    def maybe_params(self) -> Optional[list[float]]:
        if self.eof() or self.peek() not in "{[":
            return None
        close = "}" if self.get() == "{" else "]"
        out = []
        cur = []
        while True:
            if self.eof():
                raise ModelError("unterminated parameter list")
            c = self.get()
            if c == close:
                if cur:
                    out.append(float("".join(cur)))
                break
            if c == "/" or c == ",":
                if cur:
                    out.append(float("".join(cur)))
                cur = []
            else:
                cur.append(c)
        return out
