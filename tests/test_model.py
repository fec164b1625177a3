"""Model descriptor / model file / gamma discretization tests.

parse_model_file goldens are the reference's own expectations from
test/src/parse_model.cpp run against test/data/modelfiles/*.
"""

import numpy as np
import pytest

from epa_ng_tpu.io.model_files import parse_model_file
from epa_ng_tpu.models import DataType, Model, ModelError, ParamValue
from epa_ng_tpu.models.gamma import discrete_gamma_rates

D = "/root/reference/test/data/modelfiles"


def test_parse_rax8_dna():
    got = parse_model_file(f"{D}/rax8_dna")
    assert got == ("GTR{0.787874/1.821672/1.294006/0.698421/3.034135/1.000000}"
                   "+FU{0.256465/0.222535/0.308594/0.212406}+G4{0.478218}")


def test_parse_rax8_invar():
    got = parse_model_file(f"{D}/rax8_invar")
    assert got == ("GTR{1.217620/2.720208/1.342850/1.115245/3.313319/1.000000}"
                   "+FU{0.222438/0.209333/0.259930/0.308299}+IU{0.051355}"
                   "+G4{0.532224}")


def test_parse_rax8_prot():
    got = parse_model_file(f"{D}/rax8_prot")
    assert got.startswith("PROTGTR{1.003440/0.000100/2.196009/")
    assert got.endswith("+FU{0.065149/0.054231/0.041608/0.058452/0.023965/"
                        "0.036826/0.069410/0.052618/0.030732/0.067906/"
                        "0.092164/0.051878/0.022917/0.045111/0.040413/"
                        "0.069908/0.072135/0.004367/0.029144/0.071068}"
                        "+G4{0.563473}")
    rates = got[len("PROTGTR{"):got.index("}")].split("/")
    assert len(rates) == 190
    assert rates[-1] == "1.000000"


def test_parse_raxng():
    got = parse_model_file(f"{D}/raxng_dna")
    assert got == "GTR{5.56435/19.04/4.65971/2.04432/69.6551/1}+FC+G4m{0.193259}"


def test_parse_iqtree():
    got = parse_model_file(f"{D}/iqtree_dna_invar")
    assert got == ("GTR{0.9467/3.2100/1.8644/0.8054/5.5442/1.0000}"
                   "+FU{0.2415/0.2465/0.3237/0.1884}+IU{0.1257}+G4{0.8042}")


def test_model_from_parsed_files_roundtrip():
    for f in ["rax8_dna", "rax8_invar", "rax8_prot", "raxng_dna",
              "iqtree_dna_invar"]:
        m = Model.from_string(parse_model_file(f"{D}/{f}"))
        assert m.base_freqs.sum() == pytest.approx(1.0)
        assert m.subst_rates[-1] == pytest.approx(1.0)
        assert m.num_ratecats == 4


def test_gtr_g_default():
    m = Model.from_string("GTR+G")
    assert m.data_type == DataType.DNA
    assert m.num_states == 4
    assert m.num_ratecats == 4
    assert m.rate_het == "gamma"
    assert m.alpha == 1.0
    assert np.allclose(m.base_freqs, 0.25)
    assert np.allclose(m.subst_rates, [0.5, 0.5, 0.5, 0.5, 0.5, 1.0])
    # mean-mode gamma rates for alpha=1, 4 cats (Yang 1994 canonical values)
    assert np.allclose(m.ratecat_rates,
                       [0.13695378, 0.47675185, 0.99999999, 2.38629436],
                       atol=1e-6)
    assert m.ratecat_rates @ m.ratecat_weights == pytest.approx(1.0)


def test_model_user_rates_normalized():
    m = Model.from_string("GTR{2/4/2/2/8/2}+FU{0.2/0.3/0.3/0.2}")
    assert np.allclose(m.subst_rates, [1, 2, 1, 1, 4, 1])
    assert m.freqs_mode == ParamValue.USER
    assert np.allclose(m.base_freqs, [0.2, 0.3, 0.3, 0.2])


def test_model_gamma_median_and_cats():
    m = Model.from_string("GTR+G8a{0.5}")
    assert m.num_ratecats == 8
    assert m.gamma_mode == "median"
    assert m.alpha == 0.5
    assert m.ratecat_rates @ m.ratecat_weights == pytest.approx(1.0)


def test_model_pinv():
    m = Model.from_string("GTR+IU{0.25}+G4")
    assert m.pinv == 0.25
    assert m.pinv_mode == ParamValue.USER


def test_model_empirical_freqs():
    m = Model.from_string("GTR+FC+G4m{0.193259}")
    assert m.empirical_base_freqs
    assert m.alpha == pytest.approx(0.193259)
    assert m.gamma_mode == "mean"


def test_named_dna_models():
    jc = Model.from_string("JC")
    assert np.allclose(jc.subst_rates, 1.0)
    assert np.allclose(jc.base_freqs, 0.25)
    # kappa-style unique rates, normalized by the last symmetry class (0)
    hky = Model.from_string("HKY{2/1}")
    assert np.allclose(hky.subst_rates, [1, 0.5, 1, 1, 0.5, 1])


def test_bad_model_rejected():
    with pytest.raises(ModelError):
        Model.from_string("NOTAMODEL+G")


def test_protgtr():
    m = Model.from_string("PROTGTR+G")
    assert m.num_states == 20
    assert len(m.subst_rates) == 190


def test_gamma_mean_mode_values():
    # spot-check against libpll's pll_compute_gamma_cats(0.5, 4, mean)
    rates = discrete_gamma_rates(0.5, 4, "mean")
    assert rates.sum() / 4 == pytest.approx(1.0)
    assert np.all(np.diff(rates) > 0)
    # canonical alpha=0.5 four-category mean rates
    assert np.allclose(rates, [0.03338775, 0.25191592, 0.82026848, 2.89442785],
                       atol=1e-6)


def test_gamma_median_mode_values():
    rates = discrete_gamma_rates(0.5, 4, "median")
    assert (rates * 0.25).sum() == pytest.approx(1.0)
    assert np.all(np.diff(rates) > 0)


def test_builtin_aa_matrices():
    """LG/WAG/JTT/DAYHOFF are baked in (reference: pllmod_util model DB,
    reached via src/core/raxml/Model.cpp name lookup)."""
    from epa_ng_tpu.models.aa_matrices import MATRICES

    for name in ("LG", "WAG", "JTT", "DAYHOFF"):
        rates, freqs = MATRICES[name]
        assert rates.shape == (190,)
        assert freqs.shape == (20,)
        assert freqs.sum() == pytest.approx(1.0)
        assert (freqs > 0).all()
        assert (rates >= 0).all() and rates.max() > 0
        m = Model.from_string(name + "+G4{0.7}")
        assert m.num_states == 20
        assert m.num_ratecats == 4

    # spot values from the published tables (PAML order, upper triangle):
    # LG r(A,R)=0.425093 (Le & Gascuel 2008); WAG r(A,R)=0.551571
    # (Whelan & Goldman 2001); Dayhoff has structural zeros (e.g. r(N,R)=32,
    # r(D,N)=905 with r(D,R)=0 in the 1978 counts).
    assert MATRICES["LG"][0][0] == pytest.approx(0.425093)
    assert MATRICES["WAG"][0][0] == pytest.approx(0.551571)
    assert MATRICES["JTT"][0][0] == pytest.approx(58.0)
    assert (MATRICES["DAYHOFF"][0] == 0).sum() > 0  # structural zeros ok


def test_builtin_aa_symmetric_expansion():
    # the flat vector must correspond to a symmetric exchangeability matrix
    from epa_ng_tpu.models.aa_matrices import MATRICES
    iu = np.triu_indices(20, k=1)
    for name in ("LG", "WAG"):
        rates, _ = MATRICES[name]
        m = np.zeros((20, 20))
        m[iu] = rates
        m = m + m.T
        assert np.allclose(m, m.T)
        # aromatic W<->Y exchange is among the largest in both tables
        order = np.argsort(rates)
        assert rates[order[-1]] > 5


# -- ascertainment bias correction (reference Model.cpp:268-296) -----------

def test_asc_parse_lewis_roundtrip():
    from epa_ng_tpu.models.model import Model
    m = Model.from_string("GTR{1.1/2.9/0.8/1.2/3.4/1}+G4{0.6}+ASC_LEWIS")
    assert m.ascbias_type == "lewis"
    assert m.ascbias_weights is None
    assert m.to_string().endswith("+ASC_LEWIS")


def test_asc_parse_felsenstein_roundtrip():
    from epa_ng_tpu.models.model import Model
    m = Model.from_string("HKY+ASC_FELS{17}")
    assert m.ascbias_type == "felsenstein"
    assert m.ascbias_weights[0] == pytest.approx(17.0)
    assert (m.ascbias_weights[1:] == 0).all()
    assert m.to_string().endswith("+ASC_FELS{17}")


def test_asc_parse_stamatakis_roundtrip():
    from epa_ng_tpu.models.model import Model
    m = Model.from_string("GTR+ASC_STAM{3/4/5/6}")
    assert m.ascbias_type == "stamatakis"
    assert np.allclose(m.ascbias_weights, [3, 4, 5, 6])
    assert m.to_string().endswith("+ASC_STAM{3/4/5/6}")


def test_asc_rejects_bad_specs():
    from epa_ng_tpu.models.model import Model, ModelError
    with pytest.raises(ModelError, match="[Aa]scertainment"):
        Model.from_string("GTR+ASC_BOGUS")
    with pytest.raises(ModelError, match="[Aa]scertainment"):
        Model.from_string("GTR+ASC_STAM{1/2}")  # needs num_states weights
    with pytest.raises(ModelError, match="[Aa]scertainment"):
        Model.from_string("GTR+ASC_FELS")  # weight required
    # libpll cannot combine ASC with +I
    with pytest.raises(ModelError, match="invariant"):
        Model.from_string("GTR+IU{0.2}+ASC_LEWIS")
