"""Scaling-efficiency harness: throughput of the fused placement step at
1 device vs an N-device (dp x ep) mesh.

The BASELINE north star asks for >=80% scaling efficiency from 1 chip to N.
Run on a real multi-chip slice:

    python -m epa_ng_tpu.parallel.scaling [n_devices]

prints one JSON line with per-config throughput and the efficiency
(throughput_N / (N * throughput_1)).
"""

from __future__ import annotations

import json
import time

import numpy as np


def measure(n_devices: int | None = None, n_taxa=256, sites=256,
            n_queries=1024, topk=8, dtype="f32"):
    import jax
    import jax.numpy as jnp

    from epa_ng_tpu.core.engine import PlacementEngine
    from epa_ng_tpu.models import Model
    from epa_ng_tpu.parallel.mesh import (ShardedPlacement, chunk_site_width,
                                          make_mesh, placement_step)
    from epa_ng_tpu.utils.options import Options
    from epa_ng_tpu.utils.synth import synth_dataset

    devices = jax.devices()
    n = n_devices or len(devices)
    n = min(n, len(devices))

    tree, ref, qry = synth_dataset(n_taxa=n_taxa, sites=sites,
                                   n_queries=n_queries, seed=13)
    model = Model.from_string(
        "GTR{1.1/2.9/0.8/1.2/3.4/1}+FU{0.27/0.23/0.24/0.26}+G4{0.6}")
    engine = PlacementEngine(tree, ref, model, Options(compute_dtype=dtype))
    codes, qmasks, ranges = engine._encode_chunk(qry)
    tQ, invq = engine._query_tensors(qmasks)
    args = (jnp.asarray(codes), jnp.asarray(ranges[:, 0]),
            jnp.asarray(ranges[:, 1]), tQ, invq)
    W = chunk_site_width(ranges[:, 1], sites)

    def timeit(fn, reps=5):
        out = fn()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps

    blo = engine.blo
    thresh = jnp.asarray(engine.options.prescoring_threshold, engine.dtype)
    t1 = timeit(lambda: placement_step(
        engine.consts, engine.lookup_table, blo.tU, blo.tV, blo.ls,
        blo.lengths, *args, thresh, topk=topk, sliding=True, site_width=W,
        use_pallas=engine._use_pallas(W)))
    qps1 = n_queries / t1

    result = {"metric": "scaling_efficiency", "devices": n,
              "qps_1dev": round(qps1, 1)}
    if n > 1:
        n_ep = 2 if n % 2 == 0 else 1
        mesh = make_mesh(n // n_ep, n_ep, devices[:n])
        sharded = ShardedPlacement(engine, mesh, topk=topk)
        tn = timeit(lambda: sharded.step(*args))
        qpsn = n_queries / tn
        result["qps_ndev"] = round(qpsn, 1)
        result["value"] = round(qpsn / (n * qps1), 4)
        result["unit"] = "efficiency"
    else:
        result["value"] = 1.0
        result["unit"] = "efficiency"
    return result


if __name__ == "__main__":
    import sys
    n = int(sys.argv[1]) if len(sys.argv) > 1 else None
    print(json.dumps(measure(n)))
