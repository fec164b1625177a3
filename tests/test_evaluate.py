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
