"""ML model-parameter evaluation (the analog of the reference's all-params
``optimize()``, src/core/pll/optimize.cpp:329-455): branch lengths + rates
+ alpha move to a higher-likelihood point, verified against the independent
scipy-expm brute force at the optimized parameters."""

import numpy as np
import pytest

from epa_ng_tpu.core.evaluate import optimize_model
from epa_ng_tpu.io import fasta as fio
from epa_ng_tpu.models import Model
from epa_ng_tpu.tree import Tree

from tests.reference_impl import brute_tree_loglikelihood

D = "/root/reference/test/data"


def _setup():
    ref_info = fio.make_msa_info(f"{D}/aln.fasta")
    ref = fio.build_msa_from_file(f"{D}/aln.fasta", ref_info, False)
    tree = Tree.from_file(f"{D}/ref.tre")
    return tree, ref


def test_optimize_improves_and_matches_brute_force():
    tree, ref = _setup()
    model = Model.from_string("GTR+G")  # generic start: equal-ish params
    start = brute_tree_loglikelihood(tree, ref, model)

    final = optimize_model(tree, ref, model, lbfgs_steps=60)

    # substantially better than the generic start
    assert final > start + 10.0
    # the reported optimum is real: independent brute force at the
    # optimized (rates, freqs, alpha, branch lengths) agrees
    want = brute_tree_loglikelihood(tree, ref, model)
    assert final == pytest.approx(want, abs=1e-4)
    # optimized parameters are sane
    assert np.all(model.subst_rates > 0)
    assert np.all(tree.edge_lengths > 0)
    assert model.base_freqs.sum() == pytest.approx(1.0)


def test_optimize_respects_fixed_params():
    tree, ref = _setup()
    # user rates+freqs are fixed; only branch lengths (and alpha) move
    model = Model.from_string(
        "GTR{1.1/2.9/0.8/1.2/3.4/1}+FU{0.27/0.23/0.24/0.26}+G4{0.6}")
    rates0 = model.subst_rates.copy()
    freqs0 = model.base_freqs.copy()
    bl0 = tree.edge_lengths.copy()
    final = optimize_model(tree, ref, model, lbfgs_steps=40)
    assert np.allclose(model.subst_rates, rates0)
    assert np.allclose(model.base_freqs, freqs0)
    assert not np.allclose(tree.edge_lengths, bl0)  # branch lengths moved
    assert final >= brute_tree_loglikelihood(
        Tree.from_file(f"{D}/ref.tre"), ref, model) - 1e-6


def test_optimize_with_pinv():
    tree, ref = _setup()
    model = Model.from_string("GTR+G+I")  # pinv_mode ML
    final = optimize_model(tree, ref, model, lbfgs_steps=60)
    assert 0.0 < model.pinv < 1.0
    want = brute_tree_loglikelihood(tree, ref, model)
    assert final == pytest.approx(want, abs=1e-4)


def test_optimize_fixed_pinv():
    tree, ref = _setup()
    model = Model.from_string("GTR+G4{0.8}+IU{0.15}")
    final = optimize_model(tree, ref, model, lbfgs_steps=40)
    assert model.pinv == pytest.approx(0.15)
    want = brute_tree_loglikelihood(tree, ref, model)
    assert final == pytest.approx(want, abs=1e-4)


# -- ascertainment bias correction ------------------------------------------

def test_asc_corrected_reference_logl_matches_brute_force():
    """Engine-reported evaluation logl under +ASC_* equals the independent
    brute force: plain logl + the Lewis/Felsenstein/Stamatakis term built
    from scipy-expm likelihoods of the K dummy invariant columns."""
    from epa_ng_tpu.core.engine import PlacementEngine
    from epa_ng_tpu.utils.options import Options

    tree, ref = _setup()
    desc = "GTR{1.1/2.9/0.8/1.2/3.4/1}+FU{0.27/0.23/0.24/0.26}+G4{0.6}"
    base = Model.from_string(desc)
    plain = brute_tree_loglikelihood(tree, ref, base)

    inv_logls = []
    for ch in "ACGT":
        col = fio.MSA()
        for lab in tree.labels:
            col.append(lab, ch)
        inv_logls.append(brute_tree_loglikelihood(tree, col, base))
    inv_logls = np.asarray(inv_logls)
    p = np.exp(inv_logls).sum()
    S = ref.num_sites

    cases = {
        desc + "+ASC_LEWIS": plain - S * np.log1p(-p),
        desc + "+ASC_FELS{17}": plain + 17.0 * np.log(p),
        desc + "+ASC_STAM{3/4/5/6}":
            plain + float(np.dot([3, 4, 5, 6], inv_logls)),
    }
    for dstr, want in cases.items():
        eng = PlacementEngine(tree, ref, Model.from_string(dstr),
                              Options(premasking=False))
        assert eng.ref_tree_logl == pytest.approx(want, abs=1e-5), dstr


def test_asc_optimize_model_accounts_for_correction():
    """--opt-model under +ASC_LEWIS optimizes the corrected objective and
    reports a value matching the brute-force-corrected logl at the
    optimized parameters."""
    tree, ref = _setup()
    model = Model.from_string("GTR+G+ASC_LEWIS")
    final = optimize_model(tree, ref, model, lbfgs_steps=40)

    plain = brute_tree_loglikelihood(tree, ref, model)
    inv_logls = []
    for ch in "ACGT":
        col = fio.MSA()
        for lab in tree.labels:
            col.append(lab, ch)
        inv_logls.append(brute_tree_loglikelihood(tree, col, model))
    p = np.exp(np.asarray(inv_logls)).sum()
    want = plain - ref.num_sites * np.log1p(-p)
    assert final == pytest.approx(want, abs=1e-4)
