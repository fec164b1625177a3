"""Extended built-in amino-acid replacement matrices.

Closes the named-model gap against pll-modules' compiled-in protein DB
(the reference resolves these via `pllmod_util_model_info_protein`,
/root/reference/src/core/raxml/Model.cpp): every matrix here is a
published scientific constant, redistributed verbatim across PhyML /
RAxML / IQ-TREE / PAML / pll source trees, transcribed into the same
lower-triangle text format as epa_ng_tpu.models.aa_data.

Provenance per table (amino-acid order A R N D C Q E G H I L K M F P S T
W Y V, PAML convention; any positive rescaling of an exchangeability
matrix is equivalent after the mean-rate normalization in models.model):

- MTREV   Adachi & Hasegawa (1996), J. Mol. Evol. 42:459-468 (mtREV24).
- CPREV   Adachi, Waddell, Martin & Hasegawa (2000), J. Mol. Evol.
          50:348-358 (chloroplast proteins).
- MTMAM   Yang, Nielsen & Hasegawa (1998), Mol. Biol. Evol. 15:1600-1611
          (mammalian mitochondrial proteins; mtmam.dat).
- RTREV   Dimmic, Rest, Mindell & Goldstein (2002), J. Mol. Evol.
          55:65-73 (retroviral Pol proteins).
- MTART   Abascal, Posada & Zardoya (2007), Mol. Biol. Evol. 24:1-5
          (arthropod mitochondrial).

Verification: the digits below were transcribed from the standard
distributions named above and cannot be re-derived offline; each table
passes structural validation (positivity, exchange-graph connectivity,
frequency normalization — tests/test_aa_tables.py) plus a cross-table
log-rate correlation check against its published relative
(MTMAM/MTART~MTREV, CPREV~JTT, RTREV~LG), which catches row-level
garbling. To pin a table against your own copy of the canonical file,
convert it with tools/make_aa_npz.py (prints a sha-256) and drop the npz
into $EPA_NG_TPU_AA_DATA — npz entries override these builtins by name.

The remaining names in the reference's DB (NPZ_ONLY below: BLOSUM62, VT,
PMB, DCMut, JTT-DCMut, HIVb/HIVw, FLU, stmtREV, mtZOA, and the LG4M/LG4X
mixture components) are NOT reproduced here: their long-precision digits
are not confidently transcribable offline, and a silently-wrong
substitution matrix is worse than an absent one. They load from
$EPA_NG_TPU_AA_DATA npz files (tools/make_aa_npz.py converts the
published .dat/C-array tables, validates, and prints checksums).
"""

from __future__ import annotations

import numpy as np

from epa_ng_tpu.models.aa_data import _parse, builtin_matrices

N_AA = 20

_MTREV = """
23.18
26.95 13.24
17.67 1.90 794.38
59.93 103.33 58.94 1.90
1.90 220.99 173.56 55.28 75.24
9.77 1.90 63.05 583.55 1.90 313.56
120.71 23.03 53.30 56.77 30.71 6.75 28.28
13.90 165.23 496.13 113.99 141.49 582.40 49.12 1.90
96.49 1.90 27.10 4.34 62.73 8.34 3.31 5.98 12.26
25.46 15.58 15.16 1.90 25.65 39.70 1.90 2.41 11.49 329.09
8.36 141.40 608.70 2.31 1.90 465.58 313.86 22.73 127.67 19.57 14.88
141.88 1.90 65.41 1.90 6.18 47.37 1.90 1.90 11.97 517.98 537.53 91.37
6.37 4.69 15.20 4.98 70.80 19.11 2.67 1.90 48.16 84.67 216.06 6.44 90.82
54.31 23.64 73.31 13.43 31.26 137.29 12.83 1.90 60.97 20.63 40.10 50.10 18.84 17.31
387.86 6.04 494.39 69.02 277.05 54.11 54.71 125.93 77.46 47.70 73.61 105.79 111.16 64.29 169.90
480.72 2.08 238.46 28.01 179.97 94.93 14.82 11.17 44.78 368.43 126.40 136.33 528.17 33.85 128.22 597.21
1.90 21.95 10.68 19.86 33.60 1.90 1.90 10.92 7.08 1.90 32.44 24.00 21.71 7.84 4.21 38.58 9.99
6.48 1.90 191.36 21.21 254.77 38.82 13.12 3.21 670.14 25.01 44.15 51.17 39.96 465.58 16.21 64.92 38.73 26.25
195.06 7.64 1.90 1.90 1.90 19.00 21.14 2.53 1.90 1222.94 91.67 1.90 387.54 6.35 8.23 1.90 204.54 5.37 1.90
| 0.072 0.019 0.039 0.019 0.006 0.025 0.024 0.056 0.028 0.088 0.169 0.023 0.054 0.061 0.054 0.072 0.086 0.029 0.033 0.043
"""

_CPREV = """
105
227 357
175 43 4435
669 823 538 10
157 1745 768 400 10
499 152 1055 3691 10 3122
665 243 653 431 303 133 379
66 715 1405 331 441 1269 162 19
145 136 168 10 280 92 148 40 29
197 203 113 10 396 286 82 20 66 1745
236 4482 2430 412 48 3313 2629 263 305 345 218
185 125 61 47 159 202 113 21 10 1772 1351 193
68 53 97 22 726 10 145 25 127 454 1268 72 327
490 87 173 170 285 323 185 28 152 117 219 302 100 43
2440 385 2085 590 2331 396 568 691 303 216 516 868 93 487 1202
1340 314 1393 266 576 241 369 92 32 1040 156 918 645 148 260 2151
14 230 40 18 435 53 63 82 69 42 159 10 86 468 49 73 29
56 323 754 281 1466 391 142 10 1971 89 189 247 215 2370 97 522 71 346
968 92 83 75 592 54 200 91 25 4797 865 249 475 317 122 167 760 10 119
| 0.0755 0.0621 0.0410 0.0371 0.0091 0.0382 0.0495 0.0838 0.0246 0.0806 0.1011 0.0504 0.0220 0.0506 0.0431 0.0622 0.0543 0.0181 0.0307 0.0660
"""

_RTREV = """
34
51 35
10 30 384
439 92 128 1
32 221 236 78 70
81 10 9 542 1 372
135 41 84 41 98 37 30
30 90 320 91 40 323 2 2
1 24 35 10 218 10 7 16 1
45 18 15 5 95 156 8 21 123 223
38 593 58 50 62 224 282 75 8 5 12
235 57 159 10 320 234 24 10 22 931 705 111
1 7 10 1 383 1 1 1 41 90 792 18 114
97 24 56 1 148 146 82 7 28 16 72 4 15 14
460 102 550 75 503 59 38 106 44 362 52 218 100 47 91
258 64 148 65 219 71 49 31 17 695 982 120 594 35 98 2085
5 13 16 3 477 21 7 8 21 50 39 23 42 63 16 45 47
55 10 164 85 659 377 72 43 414 103 86 14 103 1202 7 36 66 558
563 21 57 38 112 87 86 14 27 6312 265 11 766 162 38 31 1220 11 23
| 0.0646 0.0453 0.0376 0.0422 0.0114 0.0606 0.0607 0.0639 0.0273 0.0679 0.1018 0.0751 0.0150 0.0287 0.0681 0.0488 0.0622 0.0251 0.0318 0.0619
"""

_MTART = """
0.2
0.2 0.2
1 4 500
254 36 98 11
0.2 154 262 0.2 0.2
0.2 0.2 183 862 0.2 262
200 0.2 121 12 81 3 44
0.2 41 180 0.2 12 314 15 0.2
26 2 21 7 63 11 7 3 0.2
4 2 13 0.2 7.8 16 2 1 6 515
0.2 209 467 2 0.2 349 106 0.2 0.2 3 4
121 0.2 79 0.2 312 67 0.2 56 0.2 515 885 106
13 5 20 0.2 184 0.2 0.2 1 14 118 263 11 322
49 0.2 17 0.2 0.2 39 8 0.2 1 0.2 12 17 5 15
673 3 398 44 664 52 31 226 11 7 8 144 112 36 87
244 0.2 166 0.2 183 44 43 0.2 19 204 48 70 289 14 47 660
0.2 0.2 8 0.2 22 7 11 2 0.2 0.2 21 16 71 54 0.2 2 0.2
1 4 251 0.2 72 87 8 9 191 12 20 117 71 792 18 30 46 38
340 0.2 23 0.2 350 0.2 14 3 0.2 1855 85 26 281 52 32 61 544 0.2 2
| 0.054116 0.018227 0.039903 0.020160 0.009709 0.018781 0.024289 0.068183 0.024518 0.092639 0.148658 0.021718 0.061453 0.088668 0.041826 0.091030 0.049194 0.029786 0.039443 0.057701
"""

_MTMAM = """
32
2 4
11 0 864
0 186 0 0
0 246 8 49 0
0 0 0 569 0 274
78 18 47 79 0 0 22
8 232 458 11 305 550 22 0
75 0 19 0 41 0 0 0 0
21 6 0 0 27 20 0 0 26 232
0 50 408 0 0 242 215 0 0 6 4
76 0 21 0 0 22 0 0 0 378 609 59
0 0 6 5 7 0 0 0 0 57 246 0 17
53 9 33 2 0 51 0 0 53 5 43 18 0 17
342 3 446 16 347 30 21 112 20 0 74 65 47 90 202
681 0 110 0 114 0 4 0 1 360 34 50 691 8 78 614
5 16 6 0 65 0 0 0 0 0 12 0 13 0 7 17 0
0 0 156 0 530 54 0 1 1525 16 25 67 0 682 8 107 0 14
398 0 0 10 0 33 20 5 0 2220 100 0 832 6 0 0 237 0 0
| 0.0692 0.0184 0.0400 0.0186 0.0065 0.0238 0.0236 0.0557 0.0277 0.0905 0.1675 0.0221 0.0561 0.0611 0.0536 0.0725 0.0870 0.0293 0.0340 0.0428
"""

# names the reference's model DB resolves that are NOT baked in here (see
# the module docstring for why); Model.from_string points users at the
# npz path for these
NPZ_ONLY = ("BLOSUM62", "VT", "PMB", "DCMUT", "JTTDCMUT", "HIVB", "HIVW",
            "FLU", "STMTREV", "MTZOA", "LG4M", "LG4X")


def _validate(name: str, rates: np.ndarray, freqs: np.ndarray):
    """Structural checks: shapes, finiteness, non-negativity, normalized
    frequencies, and exchange-graph connectivity (every amino acid
    reachable) — the same rules tools/make_aa_npz.py enforces."""
    assert rates.shape == (190,) and freqs.shape == (N_AA,), name
    assert np.isfinite(rates).all() and np.isfinite(freqs).all(), name
    assert (rates >= 0).all(), f"{name}: negative exchangeability"
    assert (freqs > 0).all(), f"{name}: non-positive frequency"
    assert abs(freqs.sum() - 1.0) < 1e-9, name
    m = np.zeros((N_AA, N_AA))
    m[np.triu_indices(N_AA, k=1)] = rates
    m = m + m.T
    assert not (m.sum(axis=1) == 0).any(), f"{name}: unreachable state"


def _log_corr(a: np.ndarray, b: np.ndarray) -> float:
    """Pearson correlation of log-exchangeabilities (zeros floored):
    a transcription-garbling tripwire — a shifted or shuffled row drives
    this toward 0, while genuinely related published matrices sit high."""
    la = np.log10(np.maximum(a, 1e-3))
    lb = np.log10(np.maximum(b, 1e-3))
    la = la - la.mean()
    lb = lb - lb.mean()
    return float((la * lb).sum()
                 / np.sqrt((la * la).sum() * (lb * lb).sum()))


def extended_matrices() -> dict[str, tuple[np.ndarray, np.ndarray]]:
    base = builtin_matrices()
    ext = {
        "MTREV": _parse(_MTREV),
        "CPREV": _parse(_CPREV),
        "MTMAM": _parse(_MTMAM),
        "RTREV": _parse(_RTREV),
        "MTART": _parse(_MTART),
    }
    for name, (rates, freqs) in ext.items():
        _validate(name, rates, freqs)
    # published-relative correlation floors (mitochondrial family members
    # correlate strongly with each other; nuclear-model relatives less so
    # but far above the ~0 of a garbled table)
    checks = [
        ("MTMAM", ext["MTREV"][0], 0.6),
        ("MTART", ext["MTREV"][0], 0.5),
        ("CPREV", base["JTT"][0], 0.4),
        ("RTREV", base["LG"][0], 0.4),
    ]
    for name, other, floor in checks:
        c = _log_corr(ext[name][0], other)
        assert c >= floor, (
            f"{name}: log-rate correlation {c:.2f} below {floor} against "
            f"its published relative — transcription suspect")
    return ext
