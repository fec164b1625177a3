"""Extended built-in AA matrices (models.aa_data_ext): every baked name
the reference's pll-modules DB resolves must build a valid model, pass
structural validation, and correlate with its published relative
(transcription tripwire). Reference anchor: Model.cpp ->
pllmod_util_model_info_protein."""

import numpy as np
import pytest

from epa_ng_tpu.models import Model
from epa_ng_tpu.models.aa_data_ext import (NPZ_ONLY, _log_corr,
                                           extended_matrices)
from epa_ng_tpu.models.model import ModelError

EXT_NAMES = ("MTREV", "CPREV", "MTMAM", "RTREV", "MTART")


def test_extended_tables_validate():
    ext = extended_matrices()  # raises on structural/correlation failure
    assert set(ext) == set(EXT_NAMES)
    for name, (rates, freqs) in ext.items():
        assert rates.shape == (190,) and freqs.shape == (20,)
        assert abs(freqs.sum() - 1.0) < 1e-9


@pytest.mark.parametrize("name", EXT_NAMES)
def test_extended_names_resolve(name):
    model = Model.from_string(f"{name}+G4{{0.7}}")
    assert model.num_states == 20
    assert model.subst_rates.shape == (190,)
    # the eigen path must produce a proper stochastic P(t)
    from epa_ng_tpu.ops import eigen
    eig = eigen.decompose(model)
    P = np.asarray(eigen.pmatrices(eig, np.asarray([0.05])))[0]
    assert P.shape[0] == eig.rates.shape[0]
    np.testing.assert_allclose(P.sum(axis=-1), 1.0, atol=1e-8)
    assert (P >= -1e-12).all()


def test_mito_family_correlations():
    ext = extended_matrices()
    assert _log_corr(ext["MTMAM"][0], ext["MTREV"][0]) > 0.6
    assert _log_corr(ext["MTART"][0], ext["MTREV"][0]) > 0.5


def test_npz_only_names_error_actionably():
    for name in ("BLOSUM62", "LG4X"):
        assert name in NPZ_ONLY
    with pytest.raises(ModelError, match="make_aa_npz"):
        Model.from_string("BLOSUM62+G")
