"""Pallas BLO kernel: interpret-mode equality against the XLA path.

The kernel is experimental (not wired into the engine): correct on TPU but
currently much slower than the XLA path — kept for further VMEM-blocking
work. This test pins its numerical behavior on CPU via the Pallas
interpreter.
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
    et = eng.edges
    codes, qmasks, ranges = eng._encode_chunk(qry)
    bits = (qmasks[:, :, None] >> np.arange(4)[None, None, :]) & 1
    qclv = jnp.asarray(bits, jnp.float32)
    site = np.arange(96)
    sm = jnp.asarray(((site[None, :] >= ranges[:, :1])
                      & (site[None, :] < ranges[:, :1] + ranges[:, 1:2])),
                     jnp.float32)
    invq = jnp.full((16, 96), -np.inf, jnp.float32)
    rng = np.random.default_rng(1)
    P = 40
    pe = jnp.asarray(rng.integers(0, eng.num_edges, P, dtype=np.int32))
    pq = jnp.asarray(rng.integers(0, 16, P, dtype=np.int32))

    args = (eng.consts, et.U[pe], et.lsU[pe], et.V[pe], et.lsV[pe],
            qclv[pq], sm[pq], et.lengths[pe])
    ref_out = newton.blo_optimize_batch(*args, invq[pq], sliding=True)
    pal_out = blo_optimize_batch_pallas(*args, interpret=True)

    logl_diff = np.abs(np.asarray(ref_out[0]) - np.asarray(pal_out[0]))
    assert logl_diff.max() < 0.05, logl_diff.max()
    # lengths agree except on logl-flat pairs (trajectory bifurcation)
    sharp = logl_diff < 1e-3
    pd = np.abs(np.asarray(ref_out[1]) - np.asarray(pal_out[1]))[sharp]
    dd = np.abs(np.asarray(ref_out[2]) - np.asarray(pal_out[2]))[sharp]
    assert pd.max() < 0.05
    assert dd.max() < 0.05
