"""Pallas BLO kernel: interpret-mode equality against the XLA path.

On a real TPU the kernel is the engine's default Newton dispatch (VMEM-
resident working set); this test pins its numerical behavior on CPU via the
Pallas interpreter against the XLA fallback, on the same pre-transformed
windows both consume in production.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from epa_ng_tpu.core.engine import PlacementEngine
from epa_ng_tpu.models import Model
from epa_ng_tpu.ops import newton
from epa_ng_tpu.ops.pallas_blo import blo_optimize_batch_pallas, blo_supported
from epa_ng_tpu.utils.options import Options
from epa_ng_tpu.utils.synth import synth_dataset


def test_pallas_blo_matches_xla_interpret():
    tree, ref, qry = synth_dataset(n_taxa=24, sites=96, n_queries=16, seed=5)
    model = Model.from_string(
        "GTR{1.1/2.9/0.8/1.2/3.4/1}+FU{0.27/0.23/0.24/0.26}+G4{0.6}")
    eng = PlacementEngine(tree, ref, model, Options(compute_dtype="f32"))
    assert blo_supported(eng.consts, 96)
    blo = eng.blo
    codes, qmasks, ranges = eng._encode_chunk(qry)
    tQ, invq = eng._query_tensors(qmasks)
    site = np.arange(96)
    sm = jnp.asarray(((site[None, :] >= ranges[:, :1])
                      & (site[None, :] < ranges[:, :1] + ranges[:, 1:2])),
                     jnp.float32)
    rng = np.random.default_rng(1)
    P = 40
    pe = jnp.asarray(rng.integers(0, eng.num_edges, P, dtype=np.int32))
    pq = jnp.asarray(rng.integers(0, 16, P, dtype=np.int32))

    args = (eng.consts, blo.tU[pe], blo.tV[pe], tQ[pq], blo.ls[pe],
            sm[pq], blo.lengths[pe], invq[pq])
    ref_out = newton.blo_optimize_batch(*args, sliding=True)
    pal_out = blo_optimize_batch_pallas(*args, interpret=True)

    logl_diff = np.abs(np.asarray(ref_out[0]) - np.asarray(pal_out[0]))
    assert logl_diff.max() < 0.05, logl_diff.max()
    # lengths agree except on logl-flat pairs (trajectory bifurcation)
    sharp = logl_diff < 1e-3
    pd = np.abs(np.asarray(ref_out[1]) - np.asarray(pal_out[1]))[sharp]
    dd = np.abs(np.asarray(ref_out[2]) - np.asarray(pal_out[2]))[sharp]
    assert pd.max() < 0.05
    assert dd.max() < 0.05
    # done flags: the pallas kernel reports per-pair convergence too
    assert np.asarray(pal_out[5]).dtype == np.bool_
