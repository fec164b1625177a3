#!/usr/bin/env python
"""Convert standard amino-acid replacement-matrix tables into the
EPA_NG_TPU_AA_DATA npz registry.

The reference resolves ~19 named AA matrices plus the LG4M/LG4X mixture
tables through pll-modules' compiled-in DB
(/root/reference/src/core/raxml/Model.cpp:154-208 ->
pllmod_util_model_info_protein). This build bakes in the four
universally-redistributed tables (LG/WAG/JTT/DAYHOFF,
epa_ng_tpu/models/aa_data.py) and loads every other name from
``$EPA_NG_TPU_AA_DATA/<NAME>.npz``; this tool produces those files from the
tables' standard distribution formats:

- PAML ``.dat`` (lower-triangular 19-row rate block + 20 frequencies; the
  format every matrix author publishes, also shipped in paml/raxml source
  trees), via ``--dat``
- a flat whitespace blob of 190 rates then 20 frequencies (e.g. pasted
  from a raxml-ng/pll C source array), via ``--flat``
- N such tables for an LG4M/LG4X-style mixture, via repeated inputs +
  ``--mixture gamma|free``

Every table is validated (count, non-negativity, row-connectivity,
frequency normalization) and a canonical SHA-256 of the float64 arrays is
printed so conversions are reproducible and checkable against published
checksums.

Usage:
  python tools/make_aa_npz.py --dat mtrev24.dat --name MTREV --out $EPA_NG_TPU_AA_DATA
  python tools/make_aa_npz.py --dat lg4m_1.dat --dat lg4m_2.dat --dat lg4m_3.dat \\
      --dat lg4m_4.dat --name LG4M --mixture gamma --out $EPA_NG_TPU_AA_DATA
  python tools/make_aa_npz.py --selftest   # round-trips the baked-in LG
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys

import numpy as np

AA_ORDER = "ARNDCQEGHILKMFPSTWYV"
N_AA = 20
N_RATES = 190


def upper_tri_from_matrix(m: np.ndarray) -> np.ndarray:
    """[20,20] symmetric -> upper-triangle row-major [190] (AR, AN, ...)."""
    out = []
    for i in range(N_AA):
        for j in range(i + 1, N_AA):
            out.append(m[i, j])
    return np.asarray(out, dtype=np.float64)


def matrix_from_lower_rows(rows: list) -> np.ndarray:
    """PAML layout: row k (k = 1..19) holds the k rates pairing amino acid
    ``AA_ORDER[k]`` with ``AA_ORDER[0..k-1]``."""
    m = np.zeros((N_AA, N_AA))
    if len(rows) != N_AA - 1:
        raise ValueError(
            f"expected {N_AA - 1} lower-triangle rows, got {len(rows)}")
    for k, row in enumerate(rows, start=1):
        if len(row) != k:
            raise ValueError(
                f"lower-triangle row {k} has {len(row)} entries, wanted {k}")
        for j, v in enumerate(row):
            m[k, j] = m[j, k] = v
    return m


def parse_dat(path: str) -> tuple[np.ndarray, np.ndarray]:
    """(rates[190], freqs[20]) from a PAML-format .dat file."""
    tokens_per_line = []
    with open(path) as f:
        for line in f:
            line = line.split("#")[0].split("//")[0]
            vals = []
            ok = True
            for t in line.split():
                try:
                    vals.append(float(t))
                except ValueError:
                    ok = False
                    break
            if ok and vals:
                tokens_per_line.append(vals)
    # first 19 numeric lines = the triangle; remaining numeric tokens (>=20)
    # = frequencies (PAML allows them split over lines)
    if len(tokens_per_line) < N_AA:
        raise ValueError(f"{path}: not a PAML .dat matrix file")
    rows = tokens_per_line[:N_AA - 1]
    rest = [v for line in tokens_per_line[N_AA - 1:] for v in line]
    if len(rest) < N_AA:
        raise ValueError(f"{path}: missing the 20 frequencies")
    freqs = np.asarray(rest[:N_AA], dtype=np.float64)
    rates = upper_tri_from_matrix(matrix_from_lower_rows(rows))
    return rates, freqs


def parse_flat(path: str) -> tuple[np.ndarray, np.ndarray]:
    """(rates[190], freqs[20]) from a flat 210-number whitespace blob
    (upper-triangle row-major rates first — the pll/raxml C-array order)."""
    text = open(path).read()
    for junk in ",{};":
        text = text.replace(junk, " ")
    vals = [float(t) for t in text.split() if _is_float(t)]
    if len(vals) < N_RATES + N_AA:
        raise ValueError(
            f"{path}: found {len(vals)} numbers, need {N_RATES + N_AA}")
    return (np.asarray(vals[:N_RATES]), np.asarray(vals[N_RATES:N_RATES + N_AA]))


def _is_float(t: str) -> bool:
    try:
        float(t)
        return True
    except ValueError:
        return False


def validate(rates: np.ndarray, freqs: np.ndarray, name: str):
    rates = np.asarray(rates, dtype=np.float64)
    freqs = np.asarray(freqs, dtype=np.float64)
    if rates.shape != (N_RATES,):
        raise ValueError(f"{name}: rates shape {rates.shape} != (190,)")
    if freqs.shape != (N_AA,):
        raise ValueError(f"{name}: freqs shape {freqs.shape} != (20,)")
    if not np.isfinite(rates).all() or not np.isfinite(freqs).all():
        raise ValueError(f"{name}: non-finite entries")
    if (rates < 0).any():
        raise ValueError(f"{name}: negative exchangeability")
    if (freqs <= 0).any():
        raise ValueError(f"{name}: non-positive frequency")
    s = freqs.sum()
    if not (0.9 < s < 1.1):
        raise ValueError(f"{name}: frequencies sum to {s:.4f}, not ~1")
    freqs = freqs / s
    # connectivity: every amino acid must be exchangeable with something
    m = np.zeros((N_AA, N_AA))
    k = 0
    for i in range(N_AA):
        for j in range(i + 1, N_AA):
            m[i, j] = m[j, i] = rates[k]
            k += 1
    if (m.sum(axis=1) == 0).any():
        dead = [AA_ORDER[i] for i in np.nonzero(m.sum(axis=1) == 0)[0]]
        raise ValueError(f"{name}: unreachable amino acid(s): {dead}")
    return rates, freqs


def checksum(rates: np.ndarray, freqs: np.ndarray) -> str:
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(rates, np.float64).tobytes())
    h.update(np.ascontiguousarray(freqs, np.float64).tobytes())
    return h.hexdigest()[:16]


def convert(inputs: list, name: str, outdir: str, fmt: str,
            mixture: str | None) -> str:
    comps = []
    for path in inputs:
        rates, freqs = (parse_dat(path) if fmt == "dat"
                        else parse_flat(path))
        comps.append(validate(rates, freqs, f"{name}:{path}"))
    os.makedirs(outdir, exist_ok=True)
    out = os.path.join(outdir, f"{name.upper()}.npz")
    if mixture:
        if len(comps) < 2:
            raise ValueError("a mixture needs >= 2 component tables")
        np.savez(out, rates=np.stack([r for r, _ in comps]),
                 freqs=np.stack([f for _, f in comps]),
                 mixtype=np.array(mixture))
        for i, (r, f) in enumerate(comps):
            print(f"{name}[{i}] sha256/16: {checksum(r, f)}")
    else:
        if len(comps) != 1:
            raise ValueError("plain matrices take exactly one input table")
        r, f = comps[0]
        np.savez(out, rates=r, freqs=f)
        print(f"{name} sha256/16: {checksum(r, f)}")
    print(f"wrote {out}")
    return out


def selftest() -> int:
    """Round-trip the baked-in LG table through the .dat writer+parser."""
    import tempfile
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from epa_ng_tpu.models.aa_data import builtin_matrices
    rates, freqs = builtin_matrices()["LG"]
    with tempfile.TemporaryDirectory() as tmp:
        dat = os.path.join(tmp, "lg.dat")
        with open(dat, "w") as f:
            m = np.zeros((N_AA, N_AA))
            k = 0
            for i in range(N_AA):
                for j in range(i + 1, N_AA):
                    m[i, j] = m[j, i] = rates[k]
                    k += 1
            for i in range(1, N_AA):
                f.write(" ".join(f"{m[i, j]:.6f}" for j in range(i)) + "\n")
            f.write("\n" + " ".join(f"{x:.6f}" for x in freqs) + "\n")
        out = convert([dat], "LGTEST", tmp, "dat", None)
        data = np.load(out)
        assert np.allclose(data["rates"], rates, atol=1e-6)
        assert np.allclose(data["freqs"], freqs / freqs.sum(), atol=1e-6)
    print("selftest OK")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--dat", action="append", default=[],
                   help="PAML .dat input (repeatable for mixtures)")
    p.add_argument("--flat", action="append", default=[],
                   help="flat 190+20 number blob input (repeatable)")
    p.add_argument("--name", help="model name to register (e.g. MTREV)")
    p.add_argument("--out", default=os.environ.get("EPA_NG_TPU_AA_DATA", "."),
                   help="output directory (default: $EPA_NG_TPU_AA_DATA)")
    p.add_argument("--mixture", choices=["gamma", "free"], default=None,
                   help="emit an LG4M/LG4X-style mixture npz")
    p.add_argument("--selftest", action="store_true")
    args = p.parse_args(argv)
    if args.selftest:
        return selftest()
    if not args.name or not (args.dat or args.flat):
        p.error("--name and at least one --dat/--flat input are required")
    if args.dat and args.flat:
        p.error("use either --dat or --flat inputs, not both")
    fmt = "dat" if args.dat else "flat"
    convert(args.dat or args.flat, args.name, args.out, fmt, args.mixture)
    return 0


if __name__ == "__main__":
    sys.exit(main())
