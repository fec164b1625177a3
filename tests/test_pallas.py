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
    # distribution-tight, max-loose: the Newton-decrement stop
    # (ops.newton.GAIN_EPSILON) bounds the FORGONE LOGL, not the length —
    # on a flat pair the two paths may stop a rounding-divergent crawl
    # step apart (step ~ 1/|lambda r|_min, a few units) while logl agrees
    # to <1e-3. Nearly all pairs are sharp and must match tightly; a real
    # arithmetic bug shifts the whole distribution.
    assert np.quantile(pd, 0.9) < 0.01
    assert np.quantile(dd, 0.9) < 0.01
    assert pd.max() < 10.0
    assert dd.max() < 10.0
    # done flags: the pallas kernel reports per-pair convergence too
    assert np.asarray(pal_out[5]).dtype == np.bool_


def test_pallas_blo_aa_matches_xla_interpret():
    """K=20 instantiation of the same kernel (protein models): the state
    count is a trace-time constant derived from the ref shapes. Two gamma
    categories, not four: the interpreter compiles the unrolled R*K^2
    back-transform fan-out on the CPU, so halving R halves a
    multi-minute compile while exercising the same K=20 code paths."""
    from epa_ng_tpu.utils.synth import AA

    tree, ref, qry = synth_dataset(n_taxa=12, sites=64, n_queries=8, seed=7,
                                   alphabet=AA)
    eng = PlacementEngine(tree, ref, Model.from_string("LG+G2{0.8}"),
                          Options(compute_dtype="f32"))
    assert blo_supported(eng.consts, 64)
    assert not blo_supported(eng.consts, 1024)  # K=20 VMEM width cap
    blo = eng.blo
    codes, qmasks, ranges = eng._encode_chunk(qry)
    tQ, invq = eng._query_tensors(qmasks)
    site = np.arange(64)
    sm = jnp.asarray(((site[None, :] >= ranges[:, :1])
                      & (site[None, :] < ranges[:, :1] + ranges[:, 1:2])),
                     jnp.float32)
    rng = np.random.default_rng(2)
    P = 24
    pe = jnp.asarray(rng.integers(0, eng.num_edges, P, dtype=np.int32))
    pq = jnp.asarray(rng.integers(0, 8, P, dtype=np.int32))

    args = (eng.consts, blo.tU[pe], blo.tV[pe], tQ[pq], blo.ls[pe],
            sm[pq], blo.lengths[pe], invq[pq])
    ref_out = newton.blo_optimize_batch(*args, sliding=True)
    pal_out = blo_optimize_batch_pallas(*args, interpret=True)

    logl_diff = np.abs(np.asarray(ref_out[0]) - np.asarray(pal_out[0]))
    assert logl_diff.max() < 0.05, logl_diff.max()
    sharp = logl_diff < 1e-3
    pd = np.abs(np.asarray(ref_out[1]) - np.asarray(pal_out[1]))[sharp]
    dd = np.abs(np.asarray(ref_out[2]) - np.asarray(pal_out[2]))[sharp]
    # distribution-tight, max-loose: the Newton-decrement stop
    # (ops.newton.GAIN_EPSILON) bounds the FORGONE LOGL, not the length —
    # on a flat pair the two paths may stop a rounding-divergent crawl
    # step apart (step ~ 1/|lambda r|_min, a few units) while logl agrees
    # to <1e-3. Nearly all pairs are sharp and must match tightly; a real
    # arithmetic bug shifts the whole distribution.
    assert np.quantile(pd, 0.9) < 0.01
    assert np.quantile(dd, 0.9) < 0.01
    assert pd.max() < 10.0
    assert dd.max() < 10.0


def test_pallas_blocked_matches_plain_interpret():
    """The blocked-window variant (full-row gathers + per-block site-window
    DMA, ops.pallas_blo.blo_optimize_batch_pallas_blocked) must match the
    per-pair windowed kernel on the same pairs."""
    from epa_ng_tpu.ops.pallas_blo import (PB, blo_optimize_batch_pallas_blocked,
                                           plan_blocks)

    tree, ref, qry = synth_dataset(n_taxa=24, sites=200, n_queries=16, seed=9)
    model = Model.from_string(
        "GTR{1.1/2.9/0.8/1.2/3.4/1}+FU{0.27/0.23/0.24/0.26}+G4{0.6}")
    eng = PlacementEngine(tree, ref, model, Options(compute_dtype="f32"))
    blo = eng.blo
    codes, qmasks, ranges = eng._encode_chunk(qry)
    perm = np.argsort(ranges[:, 0], kind="stable")
    codes, qmasks, ranges = codes[perm], qmasks[perm], ranges[perm]
    tQ, invq = eng._query_tensors(qmasks)
    S = 200
    topk = 8
    begins = ranges[:, 0].astype(np.int32)
    spans = ranges[:, 1].astype(np.int32)
    offs, Wb, NP = plan_blocks(begins, spans, S, topk)
    rng = np.random.default_rng(3)
    Q = 16
    pair_q = np.repeat(np.arange(Q), topk)
    pair_e = rng.integers(0, eng.num_edges, Q * topk, dtype=np.int32)
    pair_q = np.concatenate([pair_q, np.repeat(pair_q[-1:], NP - Q * topk)])
    pair_e = np.concatenate([pair_e, np.repeat(pair_e[-1:], NP - Q * topk)])

    offs_pair = np.repeat(offs, PB)
    local = begins[pair_q] - offs_pair
    site = np.arange(Wb)
    mask = ((site[None, :] >= local[:, None])
            & (site[None, :] < (local + spans[pair_q])[:, None]))
    fsite = np.arange(S)
    fullmask = ((fsite[None, :] >= begins[pair_q][:, None])
                & (fsite[None, :] < (begins + spans)[pair_q][:, None]))
    e_j, q_j = jnp.asarray(pair_e), jnp.asarray(pair_q)
    ls_sum = jnp.sum(jnp.asarray(fullmask, jnp.float32) * blo.ls[e_j], axis=1)

    blk = blo_optimize_batch_pallas_blocked(
        eng.consts, blo.tU[e_j], blo.tV[e_j], tQ[q_j],
        jnp.asarray(mask, jnp.float32), blo.lengths[e_j],
        jnp.asarray(offs), ls_sum, block_width=Wb, interpret=True)

    # per-pair windowed reference (plain kernel, interpret mode)
    W = 256  # covers every span; pad the tensors to the window
    padS = W - S
    def padw(x):
        return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, padS)])
    smw = ((np.arange(W)[None, :] >= begins[pair_q][:, None])
           & (np.arange(W)[None, :] < (begins + spans)[pair_q][:, None]))
    plain = blo_optimize_batch_pallas(
        eng.consts, padw(blo.tU)[e_j], padw(blo.tV)[e_j], padw(tQ)[q_j],
        padw(blo.ls)[e_j], jnp.asarray(smw, jnp.float32), blo.lengths[e_j],
        interpret=True)

    logl_diff = np.abs(np.asarray(blk[0]) - np.asarray(plain[0]))
    assert logl_diff.max() < 0.05, logl_diff.max()
    pd = np.abs(np.asarray(blk[1]) - np.asarray(plain[1]))
    dd = np.abs(np.asarray(blk[2]) - np.asarray(plain[2]))
    sharp = logl_diff < 1e-3
    assert np.quantile(pd[sharp], 0.9) < 0.01  # see rationale above
    assert np.quantile(dd[sharp], 0.9) < 0.01
    assert pd[sharp].max() < 10.0
    assert dd[sharp].max() < 10.0


def test_pallas_blo_mixture_matches_xla_interpret(tmp_path):
    """Matrix-mixture (LG4M/LG4X mechanism) instantiation: per-rate
    eigen systems ride [RK, K] coefficient tables and a per-category
    query tip; must match the XLA mixture path. Two components, not
    four, for the same interpret-compile-cost reason as the AA test
    (the per-rate mechanism is identical at any component count)."""
    from epa_ng_tpu.models import aa_matrices
    from epa_ng_tpu.utils.synth import AA

    rng_comps = np.random.RandomState(11)
    lg_rates, lg_freqs = aa_matrices.MATRICES["LG"]
    comps = []
    for i in range(2):
        r = lg_rates * np.exp(0.35 * rng_comps.randn(190))
        f = lg_freqs * np.exp(0.35 * rng_comps.randn(20))
        comps.append((r, f / f.sum()))
    aa_matrices.MIXTURES["TESTPALLAS4M"] = (comps, "gamma")
    try:
        tree, ref, qry = synth_dataset(n_taxa=10, sites=48, n_queries=6,
                                       seed=15, alphabet=AA)
        eng = PlacementEngine(tree, ref,
                              Model.from_string("TESTPALLAS4M+G2{0.9}"),
                              Options(compute_dtype="f32"))
        assert blo_supported(eng.consts, 48)
        blo = eng.blo
        codes, qmasks, ranges = eng._encode_chunk(qry)
        tQ, invq = eng._query_tensors(qmasks)
        assert tQ.shape[1] == 40  # per-category tip: RK rows
        site = np.arange(48)
        sm = jnp.asarray(((site[None, :] >= ranges[:, :1])
                          & (site[None, :] < ranges[:, :1]
                             + ranges[:, 1:2])), jnp.float32)
        rng = np.random.default_rng(4)
        P = 16
        pe = jnp.asarray(rng.integers(0, eng.num_edges, P, dtype=np.int32))
        pq = jnp.asarray(rng.integers(0, 6, P, dtype=np.int32))
        args = (eng.consts, blo.tU[pe], blo.tV[pe], tQ[pq], blo.ls[pe],
                sm[pq], blo.lengths[pe], invq[pq])
        ref_out = newton.blo_optimize_batch(*args, sliding=True)
        pal_out = blo_optimize_batch_pallas(*args, interpret=True)
        logl_diff = np.abs(np.asarray(ref_out[0]) - np.asarray(pal_out[0]))
        assert logl_diff.max() < 0.05, logl_diff.max()
        sharp = logl_diff < 1e-3
        pd = np.abs(np.asarray(ref_out[1]) - np.asarray(pal_out[1]))[sharp]
        assert np.quantile(pd, 0.9) < 0.01  # see rationale above
        assert pd.max() < 10.0
    finally:
        aa_matrices.MIXTURES.pop("TESTPALLAS4M", None)


def test_pallas_blo_pinv_matches_xla_interpret():
    """+I variant: the linear invariant-site term rides a dedicated
    kernel input; must match the XLA p-inv arithmetic."""
    tree, ref, qry = synth_dataset(n_taxa=16, sites=80, n_queries=8, seed=21)
    model = Model.from_string(
        "GTR{1.1/2.9/0.8/1.2/3.4/1}+FU{0.27/0.23/0.24/0.26}"
        "+G4{0.6}+I{0.25}")
    eng = PlacementEngine(tree, ref, model, Options(compute_dtype="f32"))
    assert eng.model.pinv == 0.25
    assert blo_supported(eng.consts, 80)
    blo = eng.blo
    codes, qmasks, ranges = eng._encode_chunk(qry)
    tQ, invq = eng._query_tensors(qmasks)
    # the invariant term must actually bite somewhere, or the test is
    # vacuous (all-random columns often have no shared state)
    assert np.isfinite(np.asarray(invq)).any()
    site = np.arange(80)
    sm = jnp.asarray(((site[None, :] >= ranges[:, :1])
                      & (site[None, :] < ranges[:, :1] + ranges[:, 1:2])),
                     jnp.float32)
    rng = np.random.default_rng(6)
    P = 24
    pe = jnp.asarray(rng.integers(0, eng.num_edges, P, dtype=np.int32))
    pq = jnp.asarray(rng.integers(0, 8, P, dtype=np.int32))
    args = (eng.consts, blo.tU[pe], blo.tV[pe], tQ[pq], blo.ls[pe],
            sm[pq], blo.lengths[pe], invq[pq])
    ref_out = newton.blo_optimize_batch(*args, sliding=True)
    pal_out = blo_optimize_batch_pallas(*args, interpret=True,
                                        has_pinv=True)
    logl_diff = np.abs(np.asarray(ref_out[0]) - np.asarray(pal_out[0]))
    assert logl_diff.max() < 0.05, logl_diff.max()
    sharp = logl_diff < 1e-3
    pd = np.abs(np.asarray(ref_out[1]) - np.asarray(pal_out[1]))[sharp]
    assert np.quantile(pd, 0.9) < 0.01  # see rationale above
    assert pd.max() < 10.0


def test_pallas_count_iters_instrumentation():
    """The count_iters measurement mode (roofline evidence path) must
    return per-block executed trip/smoothing counts without changing the
    optimization outputs."""
    tree, ref, qry = synth_dataset(n_taxa=16, sites=64, n_queries=8, seed=8)
    model = Model.from_string(
        "GTR{1.1/2.9/0.8/1.2/3.4/1}+FU{0.27/0.23/0.24/0.26}+G4{0.6}")
    eng = PlacementEngine(tree, ref, model, Options(compute_dtype="f32"))
    blo = eng.blo
    codes, qmasks, ranges = eng._encode_chunk(qry)
    tQ, invq = eng._query_tensors(qmasks)
    site = np.arange(64)
    sm = jnp.asarray(((site[None, :] >= ranges[:, :1])
                      & (site[None, :] < ranges[:, :1] + ranges[:, 1:2])),
                     jnp.float32)
    rng = np.random.default_rng(12)
    P = 16
    pe = jnp.asarray(rng.integers(0, eng.num_edges, P, dtype=np.int32))
    pq = jnp.asarray(rng.integers(0, 8, P, dtype=np.int32))
    args = (eng.consts, blo.tU[pe], blo.tV[pe], tQ[pq], blo.ls[pe],
            sm[pq], blo.lengths[pe], invq[pq])
    plain = blo_optimize_batch_pallas(*args, interpret=True)
    counted = blo_optimize_batch_pallas(*args, interpret=True,
                                        count_iters=True)
    np.testing.assert_allclose(np.asarray(plain[0]), np.asarray(counted[0]),
                               rtol=1e-6)
    trips, smooth = np.asarray(counted[6]), np.asarray(counted[7])
    assert trips.shape == smooth.shape == (1,)  # 16 pairs -> 1 block
    assert (smooth >= 1).all() and (smooth <= newton.SMOOTHINGS).all()
    # at least one inner iteration per executed solve, at most MAX_ITERS
    assert (trips >= 2 * smooth).all()
    assert (trips <= 2 * smooth * newton.MAX_ITERS).all()
