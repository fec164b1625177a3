"""Big-tree edge-sharded placement (BASELINE config 5 shape): 1000+ taxon
tree, edge CLV tensors sharded over the ep axis, placements identical to
single-device."""

import jax
import numpy as np
import pytest

import jax.numpy as jnp

from epa_ng_tpu.core.engine import PlacementEngine
from epa_ng_tpu.models import Model
from epa_ng_tpu.parallel.mesh import (ShardedPlacement, chunk_site_width,
                                      make_mesh, placement_step)
from epa_ng_tpu.utils.options import Options
from epa_ng_tpu.utils.synth import synth_dataset

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 devices")


def test_1024_taxa_edge_sharded():
    tree, ref, qry = synth_dataset(n_taxa=1024, sites=48, n_queries=8,
                                   seed=21)
    assert tree.n_edges == 2045
    model = Model.from_string(
        "GTR{1.2/2.5/0.9/1.1/3.0/1}+FU{0.26/0.24/0.25/0.25}+G4{0.8}")
    engine = PlacementEngine(tree, ref, model,
                             Options(compute_dtype="f64"))
    codes, qmasks, ranges = engine._encode_chunk(qry)
    tQ, invq = engine._query_tensors(qmasks)
    args = (jnp.asarray(codes), jnp.asarray(ranges[:, 0]),
            jnp.asarray(ranges[:, 1]), tQ, invq)

    blo = engine.blo
    thresh = jnp.asarray(0.99999, engine.dtype)
    W = chunk_site_width(ranges[:, 1], 48)
    single = placement_step(
        engine.consts, engine.lookup_table, blo.tU, blo.tV, blo.ls,
        blo.lengths, *args, thresh, topk=4, sliding=True, site_width=W)

    mesh = make_mesh(2, 4)  # 4-way edge sharding
    sharded = ShardedPlacement(engine, mesh, topk=4).step(*args)

    assert (np.asarray(single[0]) == np.asarray(sharded[0])).all()
    assert np.allclose(np.asarray(single[1]), np.asarray(sharded[1]),
                       atol=1e-8)
    assert np.all(np.asarray(sharded[0]) < engine.num_edges)
