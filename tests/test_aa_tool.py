"""tools/make_aa_npz.py: AA-table conversion/validation tooling (the
user-facing path for the ~15 pll-modules DB matrices whose digits are not
redistributable from this build; reference resolution:
/root/reference/src/core/raxml/Model.cpp:154-208)."""

import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import make_aa_npz as tool  # noqa: E402

from epa_ng_tpu.models.aa_data import builtin_matrices  # noqa: E402


def _write_dat(path, rates, freqs):
    m = np.zeros((20, 20))
    k = 0
    for i in range(20):
        for j in range(i + 1, 20):
            m[i, j] = m[j, i] = rates[k]
            k += 1
    with open(path, "w") as f:
        for i in range(1, 20):
            f.write(" ".join(f"{m[i, j]:.8f}" for j in range(i)) + "\n")
        f.write("\n" + " ".join(f"{x:.8f}" for x in freqs) + "\n")


def test_dat_roundtrip_against_builtin(tmp_path):
    rates, freqs = builtin_matrices()["JTT"]
    dat = tmp_path / "jtt.dat"
    _write_dat(dat, rates, freqs)
    out = tool.convert([str(dat)], "TESTJTT", str(tmp_path), "dat", None)
    data = np.load(out)
    np.testing.assert_allclose(data["rates"], rates, atol=1e-6)
    np.testing.assert_allclose(data["freqs"], freqs / freqs.sum(),
                               atol=1e-6)


def test_flat_format(tmp_path):
    rates, freqs = builtin_matrices()["LG"]
    blob = tmp_path / "lg.txt"
    nums = list(rates) + list(freqs)
    blob.write_text(", ".join(f"{x:.8f}" for x in nums))
    out = tool.convert([str(blob)], "TESTLG", str(tmp_path), "flat", None)
    data = np.load(out)
    np.testing.assert_allclose(data["rates"], rates, atol=1e-6)


def test_mixture_npz(tmp_path):
    rates, freqs = builtin_matrices()["LG"]
    for i in range(4):
        _write_dat(tmp_path / f"c{i}.dat", rates * (1 + 0.1 * i), freqs)
    out = tool.convert([str(tmp_path / f"c{i}.dat") for i in range(4)],
                       "TESTMIX4M", str(tmp_path), "dat", "gamma")
    data = np.load(out)
    assert data["rates"].shape == (4, 190)
    assert str(data["mixtype"]) == "gamma"


def test_validation_errors(tmp_path):
    rates, freqs = builtin_matrices()["LG"]
    bad = rates.copy()
    bad[0] = -1.0
    _write_dat(tmp_path / "neg.dat", bad, freqs)
    with pytest.raises(ValueError, match="negative"):
        tool.convert([str(tmp_path / "neg.dat")], "X", str(tmp_path),
                     "dat", None)
    with pytest.raises(ValueError, match="frequencies sum"):
        tool.validate(rates, freqs * 3, "X")
    with pytest.raises(ValueError, match="unreachable"):
        tool.validate(np.zeros(190), freqs, "X")
    with pytest.raises(ValueError, match="lower-triangle row"):
        (tmp_path / "trunc.dat").write_text(
            "\n".join(" ".join(["1.0"] * (i + 2)) for i in range(19))
            + "\n" + " ".join(["0.05"] * 20))
        tool.parse_dat(str(tmp_path / "trunc.dat"))


def test_known_name_error_is_actionable():
    from epa_ng_tpu.models import Model
    from epa_ng_tpu.models.model import ModelError
    with pytest.raises(ModelError, match="EPA_NG_TPU_AA_DATA"):
        Model.from_string("BLOSUM62+G")


def test_cli_selftest():
    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(tool.__file__), "make_aa_npz.py"),
         "--selftest"], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert "selftest OK" in r.stdout
