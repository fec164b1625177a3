"""Multi-device sharded placement: equality with the single-device engine
on the 8-virtual-device CPU mesh (the reference's test strategy analog:
1-host vs N-host identical results)."""

import jax
import numpy as np
import pytest

from epa_ng_tpu.core.engine import PlacementEngine
from epa_ng_tpu.models import Model
from epa_ng_tpu.parallel.mesh import ShardedPlacement, make_mesh, placement_step
from epa_ng_tpu.utils.options import Options
from epa_ng_tpu.utils.synth import synth_dataset

import jax.numpy as jnp

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 devices")


@pytest.fixture(scope="module")
def setup():
    tree, ref, qry = synth_dataset(n_taxa=32, sites=128, n_queries=16, seed=9)
    model = Model.from_string(
        "GTR{1.3/2.2/0.9/1.4/3.8/1}+FU{0.26/0.24/0.25/0.25}+G4{0.9}")
    engine = PlacementEngine(tree, ref, model,
                             Options(compute_dtype="f64", blo_block=64))
    codes, qmasks, ranges = engine._encode_chunk(qry)
    tQ, invq = engine._query_tensors(qmasks)
    args = (jnp.asarray(codes), jnp.asarray(ranges[:, 0]),
            jnp.asarray(ranges[:, 1]), tQ, invq)
    return engine, args


def _single_device(engine, args):
    blo = engine.blo
    return placement_step(
        engine.consts, engine.lookup_table, blo.tU, blo.tV, blo.ls,
        blo.lengths, *args,
        jnp.asarray(engine.options.prescoring_threshold, engine.dtype),
        topk=4, sliding=True)


@pytest.mark.parametrize("n_dp,n_ep", [(8, 1), (4, 2), (2, 4)])
def test_sharded_equals_single(setup, n_dp, n_ep):
    engine, args = setup
    single = _single_device(engine, args)
    mesh = make_mesh(n_dp, n_ep)
    sharded = ShardedPlacement(engine, mesh, topk=4).step(*args)
    for name, a, b in zip(["edges", "logl", "lwr", "pendant", "distal"],
                          single, sharded):
        a, b = np.asarray(a), np.asarray(b)
        if name == "edges":
            assert (a == b).all(), name
        else:
            assert np.allclose(a, b, atol=1e-8), name


def test_scaling_harness_smoke():
    """parallel.scaling.measure runs end to end on the virtual CPU mesh
    (throughput numbers are meaningless on CPU; this pins the harness
    itself — sharded step construction, efficiency arithmetic, JSON
    shape — so the multi-chip entry point can't rot)."""
    from epa_ng_tpu.parallel import scaling
    r = scaling.measure(n_devices=2, n_taxa=24, sites=96, n_queries=32)
    assert r["metric"] == "scaling_efficiency"
    assert r["devices"] == 2
    assert r["unit"] == "efficiency"
    assert r["qps_1dev"] > 0 and r["qps_ndev"] > 0
    assert 0 < r["value"]
