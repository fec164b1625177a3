"""f32-vs-f64 numerical agreement on a deep synthetic tree.

Guards the two accuracy hazards found on TPU-scale data:
- per-(site,rate) CLV rescaling (slow gamma categories underflow under
  joint per-site scaling),
- full-precision accumulation on the chained contractions (TPU matmuls
  downcast f32 operands to bf16 by default, compounding over tree depth).

On CPU the matmul-precision hazard can't reproduce (CPU f32 is true f32),
but the scaling logic and the precision-split scoring path are exercised.
"""

import numpy as np
import pytest

from epa_ng_tpu.core.engine import PlacementEngine
from epa_ng_tpu.models import Model
from epa_ng_tpu.utils.options import Options
from epa_ng_tpu.utils.synth import synth_dataset

MODEL = "GTR{1.1/2.9/0.8/1.2/3.4/1}+FU{0.27/0.23/0.24/0.26}+G4{0.6}"


@pytest.fixture(scope="module")
def engines():
    tree, ref, qry = synth_dataset(n_taxa=128, sites=256, n_queries=32,
                                   seed=11)
    e32 = PlacementEngine(tree, ref, Model.from_string(MODEL),
                          Options(compute_dtype="f32", blo_block=64))
    e64 = PlacementEngine(tree, ref, Model.from_string(MODEL),
                          Options(compute_dtype="f64", blo_block=64))
    return e32, e64, qry


def test_ref_logl_agrees(engines):
    e32, e64, _ = engines
    # relative agreement (the absolute logl is large)
    assert e32.ref_tree_logl == pytest.approx(e64.ref_tree_logl, rel=1e-5)


def test_preplace_rankings_agree(engines):
    e32, e64, qry = engines
    c32 = e32._encode_chunk(qry)
    c64 = e64._encode_chunk(qry)
    s32 = e32.preplace(c32[0], c32[2])
    s64 = e64.preplace(c64[0], c64[2])
    assert np.abs(s32 - s64).max() < 0.5
    top32 = np.argsort(-s32, axis=1)[:, 0]
    top64 = np.argsort(-s64, axis=1)[:, 0]
    assert (top32 == top64).mean() >= 0.95


def test_top_placements_agree(engines):
    """Random short reads on a random tree have flat posteriors, so the
    *edge identity* can flip between precisions when placements are
    logl-tied; the contract is: decisive placements agree, and where the
    top edge differs the logls are tied."""
    e32, e64, qry = engines
    p32 = e32.place_chunk(qry)
    p64 = e64.place_chunk(qry)
    for a, b in zip(p32, p64):
        if a.edge_nums[0] == b.edge_nums[0]:
            assert a.logls[0] == pytest.approx(b.logls[0], abs=0.5)
        else:
            # tie: the f32 winner's logl is within noise of the f64 winner's
            assert abs(a.logls[0] - b.logls[0]) < 1.0, (
                a.edge_nums[:3], b.edge_nums[:3], a.logls[0], b.logls[0])
    decisive = [(a, b) for a, b in zip(p32, p64) if b.lwrs[0] > 0.6]
    if decisive:
        agree = sum(int(a.edge_nums[0] == b.edge_nums[0])
                    for a, b in decisive)
        assert agree >= int(0.9 * len(decisive))
