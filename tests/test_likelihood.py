"""Likelihood core tests: P(t) properties, CLV passes, edge log-likelihood.

Cross-checks the JAX scan/eigendecomposition path against an independent
scipy-expm/recursive implementation (tests/reference_impl.py), plus the key
internal invariant: the edge log-likelihood is identical at every edge of
the tree.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from epa_ng_tpu.io import fasta as fio
from epa_ng_tpu.models import Model
from epa_ng_tpu.ops import clv as clv_ops
from epa_ng_tpu.ops import eigen, likelihood
from epa_ng_tpu.tree import Tree
from tests.reference_impl import brute_tree_loglikelihood

D = "/root/reference/test/data"


@pytest.fixture(scope="module")
def setup():
    tree = Tree.from_file(f"{D}/ref.tre")
    info = fio.make_msa_info(f"{D}/aln.fasta")
    msa = fio.build_msa_from_file(f"{D}/aln.fasta", info, premask=False)
    model = Model.from_string("GTR+G")
    return tree, msa, model


def _edge_logls(tree, msa, model):
    eig = eigen.decompose(model)
    tips = clv_ops.tip_clv_matrix(tree, msa, model.num_states)
    et = clv_ops.build_edge_tensors(tree, eig, tips)
    P = eigen.pmatrices(eig, tree.edge_lengths)
    inv = None
    if model.pinv > 0:
        masks = clv_ops.tip_state_masks(tree, msa, model.num_states)
        inv = likelihood.make_inv_logterm(
            clv_ops.invariant_states(masks, model.num_states),
            eig.freqs, model.pinv)
    return likelihood.edge_loglikelihood(
        et.U, et.lsU, et.V, et.lsV, P,
        jnp.asarray(eig.freqs), jnp.asarray(eig.weights),
        pinv=model.pinv, inv_logterm=inv)


def test_pmatrix_properties():
    model = Model.from_string("GTR{2/4/1/3/5/1}+FU{0.3/0.2/0.2/0.3}+G4{0.5}")
    eig = eigen.decompose(model)
    P = np.asarray(eigen.pmatrices(eig, np.array([0.1, 1.0, 10.0])))
    # rows sum to 1
    assert np.allclose(P.sum(axis=-1), 1.0, atol=1e-12)
    # all probabilities in [0, 1]
    assert (P >= 0).all() and (P <= 1 + 1e-12).all()
    # detailed balance: pi_i P_ij == pi_j P_ji
    pi = eig.freqs
    flux = pi[:, None] * P
    assert np.allclose(flux, np.swapaxes(flux, -1, -2), atol=1e-12)
    # t -> 0 gives identity
    P0 = np.asarray(eigen.pmatrices(eig, np.array(0.0)))
    assert np.allclose(P0, np.eye(4), atol=1e-12)


def test_pmatrix_matches_expm():
    from scipy.linalg import expm
    model = Model.from_string("GTR{1.2/2.1/0.7/1.1/3.3/1}+FU{0.22/0.21/0.26/0.31}")
    eig = eigen.decompose(model)
    Q = eigen.build_rate_matrix(model.subst_rates, model.base_freqs)
    for t in [0.05, 0.3, 2.0]:
        P = np.asarray(eigen.pmatrices(eig, np.array(t)))[0]
        assert np.allclose(P, expm(Q * t), atol=1e-10)


def test_edge_logl_invariant_across_edges(setup):
    tree, msa, model = setup
    logls = np.asarray(_edge_logls(tree, msa, model))
    assert logls.shape == (13,)
    assert np.all(np.isfinite(logls))
    assert np.allclose(logls, logls[0], atol=1e-8), logls - logls[0]


def test_tree_logl_matches_bruteforce(setup):
    tree, msa, model = setup
    got = float(np.asarray(_edge_logls(tree, msa, model))[0])
    want = brute_tree_loglikelihood(tree, msa, model)
    assert got == pytest.approx(want, abs=1e-6)


def test_tree_logl_bruteforce_with_pinv(setup):
    tree, msa, _ = setup
    model = Model.from_string("GTR{1/2/1/1/4/1}+FU{0.3/0.2/0.2/0.3}+IU{0.2}+G4{0.7}")
    got = float(np.asarray(_edge_logls(tree, msa, model))[0])
    want = brute_tree_loglikelihood(tree, msa, model)
    assert got == pytest.approx(want, abs=1e-6)


def test_logl_invariant_to_rooting():
    """Re-rooting the same tree must not change the likelihood, and
    preserve_rooting (output numbering only) must not either."""
    info = fio.make_msa_info(f"{D}/aln.fasta")
    msa = fio.build_msa_from_file(f"{D}/aln.fasta", info, premask=False)
    model = Model.from_string("GTR+G")

    def logl(newick_or_file, from_file=False):
        tree = (Tree.from_file(newick_or_file) if from_file
                else Tree.from_string(newick_or_file))
        sub = fio.MSA(num_sites=msa.num_sites)
        for s in msa:
            if s.header in tree.labels:
                sub.sequences.append(s)
        return float(np.asarray(_edge_logls(tree, sub, model))[0])

    # same unrooted tree: two vroot choices + a rooted input whose root
    # splits the A edge into 0.04 + 0.06
    vals = [
        logl("(A:0.1,(B:0.2,(C:0.3,D:0.4):0.25):0.15,E:0.5);"),
        logl("((C:0.3,D:0.4):0.25,B:0.2,(A:0.1,E:0.5):0.15);"),
        logl("(A:0.04,((B:0.2,(C:0.3,D:0.4):0.25):0.15,E:0.5):0.06);"),
    ]
    for v in vals[1:]:
        assert v == pytest.approx(vals[0], abs=1e-8)

    # preserve_rooting only affects numbering, not the likelihood
    t_pres = Tree.from_file(f"{D}/ref_rooted.tre")
    t_nopres = Tree.from_file(f"{D}/ref_rooted.tre", preserve_rooting=False)
    assert np.allclose(t_pres.edge_lengths, t_nopres.edge_lengths)


def test_aa_likelihood_bruteforce():
    """20-state path against the brute-force implementation."""
    rng = np.random.default_rng(0)
    rates = rng.uniform(0.1, 3.0, 190)
    rates[-1] = 1.0
    freqs = rng.uniform(0.5, 2.0, 20)
    freqs /= freqs.sum()
    desc = ("PROTGTR{" + "/".join(f"{r:.6f}" for r in rates) + "}+FU{"
            + "/".join(f"{f:.6f}" for f in freqs) + "}+G4{0.8}")
    model = Model.from_string(desc)
    tree = Tree.from_string(
        "(Cow:0.2,((Chicken:0.3,(Human:0.25,Loach:0.45):0.1):0.05,"
        "(Mouse:0.15,(Seal:0.2,Whale:0.1):0.08):0.12):0.06,Frog:0.35);")
    info = fio.make_msa_info(f"{D}/AA_aln.fasta")
    msa = fio.build_msa_from_file(f"{D}/AA_aln.fasta", info, premask=False)
    got = float(np.asarray(_edge_logls(tree, msa, model))[0])
    want = brute_tree_loglikelihood(tree, msa, model)
    assert got == pytest.approx(want, abs=1e-6)
