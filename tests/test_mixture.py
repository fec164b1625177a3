"""Matrix-mixture models (the LG4M/LG4X mechanism): one substitution matrix
per rate category (reference: src/core/raxml/Model.cpp:154-208 init_mix_model
and pll-modules' protmix DB).

The published LG4M/LG4X tables load through the npz registry
(EPA_NG_TPU_AA_DATA); these tests exercise the full mechanism with synthetic
mixtures built from the baked-in LG matrix: parsing, per-category
eigendecomposition, CLV/likelihood/lookup/Newton paths, and brute-force
equality against the independent scipy-expm implementation.
"""

import numpy as np
import pytest

from epa_ng_tpu.io import fasta as fio
from epa_ng_tpu.models import Model
from epa_ng_tpu.models import aa_matrices
from epa_ng_tpu.models.model import ModelError
from epa_ng_tpu.tree import Tree
from epa_ng_tpu.utils.options import Options

D = "/root/reference/test/data"

AA_TREE = ("(Cow:0.2,((Chicken:0.3,(Human:0.25,Loach:0.45):0.1):0.05,"
           "(Mouse:0.15,(Seal:0.2,Whale:0.1):0.08):0.12):0.06,Frog:0.35);")


def _synthetic_components(n=4, spread=0.35):
    """n (rates, freqs) components derived deterministically from LG."""
    lg_rates, lg_freqs = aa_matrices.MATRICES["LG"]
    rng = np.random.RandomState(11)
    comps = []
    for i in range(n):
        r = lg_rates * np.exp(spread * rng.randn(190))
        f = lg_freqs * np.exp(spread * rng.randn(20))
        comps.append((r, f / f.sum()))
    return comps


@pytest.fixture()
def mixreg():
    """Temporarily register synthetic mixtures TESTMIX4M (gamma-coupled)
    and TESTMIX4X (free rates)."""
    comps = _synthetic_components()
    aa_matrices.MIXTURES["TESTMIX4M"] = (comps, "gamma")
    aa_matrices.MIXTURES["TESTMIX4X"] = (comps, "free")
    # degenerate mixture: 4 identical LG components
    lg = aa_matrices.MATRICES["LG"]
    aa_matrices.MIXTURES["TESTSAME4M"] = ([lg] * 4, "gamma")
    yield comps
    for k in ("TESTMIX4M", "TESTMIX4X", "TESTSAME4M"):
        aa_matrices.MIXTURES.pop(k, None)


@pytest.fixture()
def aa_data(tmp_path):
    tree_file = tmp_path / "aa.tre"
    tree_file.write_text(AA_TREE + "\n")
    tree = Tree.from_file(str(tree_file))
    ref_info = fio.make_msa_info(f"{D}/AA_aln.fasta")
    qry_info = fio.make_msa_info(f"{D}/AA_query.fasta")
    fio.MSAInfo.or_mask(ref_info, qry_info)
    ref = fio.build_msa_from_file(f"{D}/AA_aln.fasta", ref_info, True)
    qry = fio.build_msa_from_file(f"{D}/AA_query.fasta", qry_info, True)
    return tree, ref, qry


# --- parsing -----------------------------------------------------------


def test_mixture_model_parsing(mixreg):
    m = Model.from_string("TESTMIX4M+G4{0.8}")
    assert m.num_states == 20 and m.num_ratecats == 4
    assert m.rate_het == "gamma" and m.alpha == 0.8
    assert len(m.submodels) == 4
    # gamma-coupled category rates
    assert m.ratecat_rates[0] < m.ratecat_rates[-1]
    assert np.allclose(m.ratecat_weights, 0.25)

    x = Model.from_string("TESTMIX4X+R4{0.2/0.6/1.2/2.0}{0.1/0.2/0.3/0.4}")
    assert x.rate_het == "free" and x.num_ratecats == 4
    assert np.allclose(x.ratecat_weights, [0.1, 0.2, 0.3, 0.4])
    # free rates normalized so sum w_r r_r == 1
    assert np.isclose((x.ratecat_rates * x.ratecat_weights).sum(), 1.0)

    # defaults: free mixture with no +R gets equal weights, unit rates
    x2 = Model.from_string("TESTMIX4X")
    assert x2.num_ratecats == 4 and x2.rate_het == "free"
    assert np.allclose(x2.ratecat_rates, 1.0)


def test_mixture_model_errors(mixreg):
    with pytest.raises(ModelError):  # category count mismatch
        Model.from_string("TESTMIX4M+G2")
    with pytest.raises(ModelError):  # freqs override
        Model.from_string("TESTMIX4M+FC")
    with pytest.raises(ModelError):  # user rates override
        Model.from_string("TESTMIX4M{1/2/3}")
    # unregistered-but-known mixture names give the npz hint
    with pytest.raises(ModelError, match="EPA_NG_TPU_AA_DATA"):
        Model.from_string("LG4X")


def test_mixture_npz_roundtrip(tmp_path, monkeypatch):
    comps = _synthetic_components(3)
    np.savez(tmp_path / "mymix.npz",
             rates=np.stack([r for r, _ in comps]),
             freqs=np.stack([f for _, f in comps]),
             mixtype="gamma")
    monkeypatch.setenv("EPA_NG_TPU_AA_DATA", str(tmp_path))
    aa_matrices._load_external()
    try:
        got, mixtype = aa_matrices.MIXTURES["MYMIX"]
        assert mixtype == "gamma" and len(got) == 3
        np.testing.assert_allclose(got[1][0], comps[1][0])
        m = Model.from_string("MYMIX+G3{0.5}")
        assert m.num_ratecats == 3
    finally:
        aa_matrices.MIXTURES.pop("MYMIX", None)


# --- likelihood against the independent brute force ---------------------


def test_mixture_ref_logl_brute_force(mixreg, aa_data):
    from epa_ng_tpu.core.engine import PlacementEngine
    from tests.reference_impl import brute_tree_loglikelihood
    tree, ref, _ = aa_data
    model = Model.from_string("TESTMIX4M+G4{0.7}")
    eng = PlacementEngine(tree, ref, model, Options(compute_dtype="f64"))
    want = brute_tree_loglikelihood(tree, ref, model)
    assert eng.ref_tree_logl == pytest.approx(want, abs=1e-6)

    # free-rate mixture too
    modelx = Model.from_string(
        "TESTMIX4X+R4{0.3/0.7/1.3/1.7}{0.25/0.25/0.25/0.25}")
    engx = PlacementEngine(tree, ref, modelx, Options(compute_dtype="f64"))
    wantx = brute_tree_loglikelihood(tree, ref, modelx)
    assert engx.ref_tree_logl == pytest.approx(wantx, abs=1e-6)


def test_degenerate_mixture_equals_uniform(mixreg, aa_data):
    """A mixture of 4 identical LG components must reproduce the plain
    LG+G4 model bit-for-bit through placement."""
    from epa_ng_tpu.core.engine import PlacementEngine
    tree, ref, qry = aa_data
    opts = Options(compute_dtype="f64", blo_block=32)
    m_mix = Model.from_string("TESTSAME4M+G4{0.6}")
    m_uni = Model.from_string("LG+G4{0.6}")
    e_mix = PlacementEngine(tree, ref, m_mix, opts)
    e_uni = PlacementEngine(tree, ref, m_uni, opts)
    assert e_mix.ref_tree_logl == pytest.approx(e_uni.ref_tree_logl,
                                                abs=1e-8)
    p_mix = e_mix.place_chunk(qry)
    p_uni = e_uni.place_chunk(qry)
    assert len(p_mix) == len(p_uni)
    for a, b in zip(p_mix, p_uni):
        assert list(a.edge_nums) == list(b.edge_nums)
        np.testing.assert_allclose(a.logls, b.logls, atol=1e-6)
        np.testing.assert_allclose(a.pendant_lengths, b.pendant_lengths,
                                   atol=1e-8)


def test_mixture_placement_end_to_end(mixreg, aa_data):
    """Heterogeneous mixture placement: engine runs, preplacement scores
    match brute-force extended-tree likelihoods, thorough logl matches
    brute force at the optimized lengths."""
    from epa_ng_tpu.core.engine import PlacementEngine
    from epa_ng_tpu.ops.newton import DEFAULT_PENDANT
    from tests.reference_impl import brute_tree_loglikelihood
    from tests.test_placement import attach_query_newick
    tree, ref, qry = aa_data
    model = Model.from_string("TESTMIX4M+G4{0.9}")
    eng = PlacementEngine(tree, ref, model,
                          Options(compute_dtype="f64", blo_block=32))
    pqs = eng.place_chunk(qry)
    assert [pq.headers[0] for pq in pqs] == ["Rat", "Carp"]
    for pq in pqs:
        assert np.isfinite(pq.logls).all()

    codes, qmasks, ranges = eng._encode_chunk(qry)
    scores = eng.preplace(codes, ranges)
    b, s = ranges[0]
    if b == 0 and s == ref.num_sites:
        for edge in [0, 5, 9]:
            half = tree.edge_lengths[edge] / 2
            nwk = attach_query_newick(tree, edge, DEFAULT_PENDANT, half)
            ext = Tree.from_string(nwk)
            msa2 = fio.MSA(num_sites=ref.num_sites)
            msa2.sequences = list(ref.sequences)
            msa2.append("QUERY", qry[0].sequence)
            want = brute_tree_loglikelihood(ext, msa2, model)
            assert scores[0, edge] == pytest.approx(want, abs=1e-5)

    rat = pqs[0]
    edge = int(rat.edge_nums[0])
    nwk = attach_query_newick(tree, edge, rat.pendant_lengths[0],
                              rat.distal_lengths[0])
    ext = Tree.from_string(nwk)
    msa2 = fio.MSA(num_sites=ref.num_sites)
    msa2.sequences = list(ref.sequences)
    msa2.append("QUERY", qry[0].sequence)
    want = brute_tree_loglikelihood(ext, msa2, model)
    assert rat.logls[0] == pytest.approx(want, abs=1e-5)
