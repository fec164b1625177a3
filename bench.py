"""Benchmark: queries placed per second per chip (full pipeline).

Runs the fused placement step (preplacement scoring -> dynamic-heuristic
top-k candidate selection -> batched Newton branch-length optimization ->
LWR) on a synthetic dataset sized like a real metagenomic workload
(512-taxon reference tree / 1021 edges, 512-site alignment, short-read
queries), in f32 on whatever accelerator JAX provides (the real TPU chip
under the driver; CPU fallback otherwise).

Prints ONE json line:
  {"metric": ..., "value": N, "unit": "queries/s", "vs_baseline": N}

vs_baseline derivation: the reference repo publishes no numbers; its paper
(Barbera et al. 2018, doi:10.1093/sysbio/syy054, cited in the reference
README) reports ~1e9 reads placed on a 3748-taxon tree in <7 h on 2048
cores with the default heuristic => ~19.4 queries/s/core, i.e. ~310
queries/s for a 16-core CPU node. We use 310 q/s as the single-node
reference baseline; vs_baseline = our queries/s/chip divided by that.
"""

import json
import sys
import time

REFERENCE_NODE_QPS = 310.0

N_TAXA = 512
SITES = 512
# enough chunks that the one final device sync (~20 ms through the TPU
# tunnel) amortizes away, matching the streaming engine's steady state
# (it queues chunk steps and only syncs when draining results)
N_QUERIES = 8192
CHUNK = 512
TOPK = 8


def main():
    import numpy as np

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/epa_ng_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from epa_ng_tpu.core.engine import PlacementEngine
    from epa_ng_tpu.models import Model
    from epa_ng_tpu.parallel.mesh import placement_step
    from epa_ng_tpu.utils.options import Options
    from epa_ng_tpu.utils.synth import synth_dataset

    backend = jax.default_backend()
    tree, ref, qry = synth_dataset(n_taxa=N_TAXA, sites=SITES,
                                   n_queries=N_QUERIES, seed=7)
    model = Model.from_string(
        "GTR{1.1/2.9/0.8/1.2/3.4/1}+FU{0.27/0.23/0.24/0.26}+G4{0.6}")
    opts = Options(compute_dtype="f32", premasking=True)
    engine = PlacementEngine(tree, ref, model, opts)
    table = engine.lookup_table

    # encode all queries up front (host-side prep is overlapped with device
    # compute in the streaming engine; excluded here like the reference's
    # "Time spent placing" excludes file parsing)
    from epa_ng_tpu.ops.pallas_blo import plan_blocks
    from epa_ng_tpu.parallel.mesh import chunk_site_width
    chunks = []
    for start in range(0, N_QUERIES, CHUNK):
        sub = qry.sequences[start:start + CHUNK]
        from epa_ng_tpu.io.fasta import MSA
        msa = MSA(sequences=sub, num_sites=qry.num_sites)
        codes, qmasks, ranges = engine._encode_chunk(msa)
        # sort by range begin for tight blocked-kernel site windows
        perm = np.argsort(ranges[:, 0], kind="stable")
        codes, qmasks, ranges = codes[perm], qmasks[perm], ranges[perm]
        tQ, invq = engine._query_tensors(qmasks)
        # static shapes computed host-side at encode time: device arrays
        # here would force a device->host sync per chunk in the hot loop,
        # serializing dispatches (block offsets are planned ON DEVICE
        # after candidate compaction; only the width is static)
        W = chunk_site_width(ranges[:, 1], SITES)
        _, Wb, _ = plan_blocks(ranges[:, 0].astype(np.int32),
                               ranges[:, 1].astype(np.int32),
                               SITES, TOPK)
        chunks.append((
            jnp.asarray(codes), jnp.asarray(ranges[:, 0]),
            jnp.asarray(ranges[:, 1]), tQ, invq, W, Wb))

    thresh = jnp.asarray(opts.prescoring_threshold, engine.dtype)

    blo = engine.blo

    def step(ch):
        codes, begins, spans, tQ, invq, W, Wb = ch
        use_pallas = engine._use_pallas(Wb)
        return placement_step(engine.consts, table, blo.tU, blo.tV,
                              blo.ls, blo.lengths, codes, begins, spans,
                              tQ, invq, thresh, topk=TOPK, sliding=True,
                              site_width=W,
                              use_pallas=use_pallas,
                              block_width=Wb if use_pallas else None)

    # warmup / compile (once per distinct shape signature)
    seen = set()
    for ch in chunks:
        key = (ch[5], ch[6])  # (site_width, block_width)
        if key not in seen:
            seen.add(key)
            jax.block_until_ready(step(ch))

    t0 = time.perf_counter()
    results = []
    for ch in chunks:
        results.append(step(ch))
    jax.block_until_ready(results)
    dt = time.perf_counter() - t0

    qps = N_QUERIES / dt

    # sanity: finite logls, no padded edges selected
    logl0 = np.asarray(results[0][1])
    assert np.isfinite(logl0).all(), "bench produced non-finite logls"

    print(json.dumps({
        "metric": "queries_placed_per_sec_per_chip",
        "value": round(qps, 2),
        "unit": "queries/s",
        "vs_baseline": round(qps / REFERENCE_NODE_QPS, 3),
        "backend": backend,
        "config": {"taxa": N_TAXA, "edges": engine.num_edges,
                   "sites": SITES, "queries": N_QUERIES, "chunk": CHUNK,
                   "topk": TOPK, "dtype": "f32",
                   "wall_s": round(dt, 3)},
    }))


if __name__ == "__main__":
    sys.exit(main())
