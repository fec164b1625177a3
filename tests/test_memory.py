"""Device-memory accounting: the engine's retained HBM footprint.

The reference supports trees whose CLV set exceeds RAM via -b lazy paging
(/root/reference/src/tree/Tree.cpp:80-117). The TPU engine's answer is
(a) a strict working-set diet — after init only the lookup table and the
BLO store stay resident (the raw edge CLVs are freed), (b) bf16 split
storage for the lookup table, and (c) ep-axis edge sharding across chips
(tests/test_bigtree_sharded.py). These tests pin down (a) and (b).
"""

import numpy as np
import pytest

from epa_ng_tpu.core.engine import PlacementEngine
from epa_ng_tpu.models import Model
from epa_ng_tpu.utils.options import Options
from epa_ng_tpu.utils.synth import synth_dataset

MODEL = "GTR{1.1/2.9/0.8/1.2/3.4/1}+FU{0.27/0.23/0.24/0.26}+G4{0.6}"


def _engine(lookup_dtype="auto", **kw):
    tree, ref, qry = synth_dataset(n_taxa=32, sites=256, n_queries=16, seed=3)
    opts = Options(lookup_dtype=lookup_dtype, blo_block=64, **kw)
    return PlacementEngine(tree, ref, Model.from_string(MODEL), opts), qry


def _nbytes(x):
    if isinstance(x, tuple):
        return sum(_nbytes(v) for v in x)
    return x.size * x.dtype.itemsize


def test_edge_tensors_freed_after_init():
    eng, qry = _engine()
    assert eng.edges is None  # 2x BLO-store footprint returned to HBM
    # placement still works end to end without them
    assert len(eng.place_chunk(qry)) == 16


def test_retained_footprint_is_single_copy():
    """Retained device bytes == lookup table + BLO store + O(E) lengths;
    specifically NOT the ~3x copies flagged in round 1 (EdgeTensors +
    BloTensors + table simultaneously)."""
    eng, _ = _engine()
    E, S = eng.num_edges, eng.num_sites
    R, K, C = 4, 4, 16
    f = np.dtype(np.float64).itemsize  # tests run f64 on CPU
    table = E * C * S * f
    blo = 2 * E * R * K * S * f + E * S * f + E * f
    edge_tensors = 2 * E * R * K * S * f + 2 * E * R * S * f  # the freed 2x
    retained = _nbytes(eng.lookup_table) + sum(
        _nbytes(t) for t in (eng.blo.tU, eng.blo.tV, eng.blo.ls,
                             eng.blo.lengths))
    assert retained == table + blo
    assert retained < table + blo + edge_tensors  # the round-1 footprint


def test_bf16_lookup_halves_table_and_preserves_ranking():
    eng32, qry = _engine()
    eng16, _ = _engine(lookup_dtype="bf16")
    resid, mean = eng16.lookup_table
    assert resid.dtype == np.dtype("bfloat16")
    full = _nbytes(eng32.lookup_table)
    assert _nbytes(resid) + _nbytes(mean) < 0.40 * full  # f64 tests: 8->2+8/C

    ec = eng32.encode_msa(qry)
    s32 = eng32.preplace(ec.codes, ec.ranges)
    s16 = eng16.preplace(ec.codes, ec.ranges)
    # scores agree to well under a logl unit; top-1 candidates identical
    np.testing.assert_allclose(s16, s32, atol=0.5)
    np.testing.assert_array_equal(np.argmax(s16, axis=1),
                                  np.argmax(s32, axis=1))


def test_bf16_lookup_end_to_end_same_best_placement():
    eng32, qry = _engine()
    eng16, _ = _engine(lookup_dtype="bf16")
    p32 = eng32.place_chunk(qry)
    p16 = eng16.place_chunk(qry)
    for a, b in zip(p32, p16):
        assert a.edge_nums[0] == b.edge_nums[0]
        assert a.logls[0] == pytest.approx(b.logls[0], abs=1e-6)


def test_no_qcs_onehot_materialization():
    """Preplacement at production chunk x long-alignment shapes: the old
    one-hot path would materialize a [Q,C,S] float tensor (3.2 GB at
    Q=5000, S=10000); the segmented contraction keeps peak memory at
    O(Q*S). Run Q=512, S=4096 under a 256 MB transient budget proxy by
    asserting the jitted computation stays under 4x the input sizes."""
    import jax
    tree, ref, _ = synth_dataset(n_taxa=16, sites=4096, n_queries=4, seed=1)
    eng = PlacementEngine(tree, ref, Model.from_string(MODEL),
                          Options(blo_block=64))
    Q, S = 512, eng.num_sites
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 16, size=(Q, S)).astype(np.uint8)
    ranges = np.zeros((Q, 2), np.int32)
    ranges[:, 1] = S
    from epa_ng_tpu.ops import lookup as lk
    import jax.numpy as jnp
    fn = jax.jit(lambda t, c, b, s: lk.preplace_scores_core(t, c, b, s))
    m = fn.lower(eng.lookup_table, jnp.asarray(codes),
                 jnp.asarray(ranges[:, 0]),
                 jnp.asarray(ranges[:, 1])).compile().memory_analysis()
    if m is not None:  # not all backends report
        budget = 4 * (eng.lookup_table.size * 8 + Q * S * 10)
        assert m.temp_size_in_bytes < budget, m.temp_size_in_bytes
