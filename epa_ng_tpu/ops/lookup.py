"""Preplacement: per-edge per-character log-likelihood lookup tables and the
batched query scoring contraction.

The reference builds, lazily per branch, a [sites x chars] matrix of per-site
log-likelihoods for every possible input character, then scores each query by
a gather+sum over its characters (src/core/Lookup_Store.hpp:110-141,
src/tree/Tiny_Tree.cpp:18-46,114-128). Here the whole store is one dense
``[edges, sites, chars]`` tensor built in a single batched contraction, and
scoring all queries against all edges is ONE matmul on the MXU:

    scores[q, e] = sum_s table[e, s, code(q, s)]
                 = reshape(onehot(codes) * range_mask, [Q, S*C])
                   @ reshape(table, [E, S*C]).T
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# TPU matmuls downcast f32 operands to bf16 by default; the chained CLV
# contractions need full f32 precision (bf16 error compounds across ~tree
# depth products and corrupts logls on large trees).
_PP = jax.lax.Precision.HIGHEST

from epa_ng_tpu.ops.newton import DEFAULT_PENDANT, EigConsts


@jax.jit
def build_lookup_tables(c: EigConsts, U, lsU, V, lsV, lengths, char_clvs,
                        inv_logfreq_chars, site_map=None):
    """[E, C, S] per-site log-likelihood of placing each lookup character.

    U, V: [E,R,K,S]; lsU, lsV: [E,R,S]; lengths: [E]; char_clvs: [C,K]
    multi-hot rows for every lookup column; inv_logfreq_chars: [C,S]
    log(pinv * pi_inv(c,s)) where invariance intersects the reference tips
    with the placed character (-inf elsewhere; all -inf when pinv == 0).

    ``site_map``: [S_full] int32 pattern index per original site when the
    edge tensors are pattern-compressed (site-repeats analog); the table is
    computed once per unique pattern and gather-expanded to full width at
    the end (scoring needs full-site addressing because queries differ at
    duplicated reference columns). In that case ``inv_logfreq_chars`` is
    already in compressed [C, S_patterns] space.

    Insertion geometry matches the preplacement Tiny_Tree: proximal = distal
    = original/2, pendant = -log(0.9) (reference: tiny_util.cpp:289,
    pll_util.cpp:354-386).
    """
    # eigen-space propagation over half branches
    mix = c.A.ndim == 3
    ev = c.eigenvals if mix else c.eigenvals[None, :]
    x = ev * c.rates[:, None] / (1.0 - c.pinv)                    # [R,K]
    half = lengths / 2.0
    e_half = jnp.exp(x[None] * half[:, None, None])               # [E,R,K]

    def msg(clv, e_t):
        if mix:
            tX = jnp.einsum("rkj,erjs->erks", c.Ainv, clv, precision=_PP)
            return jnp.einsum("rik,erk,erks->eris", c.A, e_t, tX,
                              precision=_PP)
        tX = jnp.einsum("kj,erjs->erks", c.Ainv, clv, precision=_PP)
        return jnp.einsum("ik,erk,erks->eris", c.A, e_t, tX, precision=_PP)

    inner = msg(U, e_half) * msg(V, e_half)                       # [E,R,K,S]

    # per-(site,rate) scale folding with a per-site max-shift
    ls = lsU + lsV                                                # [E,R,S]
    m = jnp.max(ls, axis=1)                                       # [E,S]
    inner = inner * jnp.exp(ls - m[:, None, :])[:, :, None, :]

    # character messages through the default pendant branch
    e_pen = jnp.exp(x * DEFAULT_PENDANT)                          # [R,K]
    if mix:
        tC = jnp.einsum("rkj,cj->crk", c.Ainv, char_clvs, precision=_PP)
        Mc = jnp.einsum("rik,rk,crk->cri", c.A, e_pen, tC, precision=_PP)
        lk = jnp.einsum("eris,cri,ri,r->ecs", inner, Mc, c.freqs,
                        c.weights, precision=_PP)
    else:
        tC = jnp.einsum("kj,cj->ck", c.Ainv, char_clvs, precision=_PP)
        Mc = jnp.einsum("ik,rk,ck->cri", c.A, e_pen, tC, precision=_PP)              # [C,R,K]
        lk = jnp.einsum("eris,cri,i,r->ecs", inner, Mc, c.freqs, c.weights, precision=_PP)
    # keep the table finite: -inf entries would turn the masked one-hot
    # score matmul into NaN (0 * -inf), and f32 flushes tiny guards to zero
    lk = jnp.maximum(lk, jnp.finfo(lk.dtype).tiny)
    table = jnp.log(lk) + m[:, None, :]
    # p-inv: log((1-p) * lk_scaled + p * pi_inv)
    table = jnp.logaddexp(jnp.log1p(-c.pinv) + table,
                          inv_logfreq_chars[None])
    table = jnp.maximum(table, jnp.finfo(table.dtype).min / 2)
    if site_map is not None:
        table = jnp.take(table, site_map, axis=2)
    return table


def split_table(table, resid_dtype=None):
    """(resid, mean) split of a lookup table: mean [E,S] stays full
    precision, the small-magnitude residuals [E,C,S] may be stored bf16 —
    halving the engine's dominant big-tree buffer at <0.1 logl-unit score
    error (the thorough stage recomputes exact logls anyway)."""
    mean = jnp.mean(table, axis=1)
    resid = table - mean[:, None, :]
    if resid_dtype is not None:
        resid = resid.astype(resid_dtype)
    return resid, mean


def preplace_scores_core(table, codes, begins, spans):
    """scores[q, e] = masked gather-sum of the lookup table (trace-time
    building block shared by the fused placement step and the exact path).

    table: [E,C,S], or a (resid [E,C,S], mean [E,S]) pair from
    :func:`split_table`; codes: [Q,S] lookup-column ids; begins/spans: [Q]
    valid ranges (reference premasking semantics: sites outside the range
    contribute nothing, gaps inside contribute the gap column).

    Precision split: per-site logl magnitudes are large, so a bf16 MXU
    pass loses ~0.4% per term. The per-(edge,site) mean is accumulated
    with a full-precision (but C-times smaller) matmul, only the small
    residuals ride the fast default precision. The residual contraction
    runs as C [Q,S]x[S,E] matmuls so no [Q,C,S] one-hot is ever
    materialized (a chunk_size x 20k-site chunk would need gigabytes).
    """
    if isinstance(table, tuple):
        resid, mean = table
    else:
        resid, mean = split_table(table)
    E, C, S = resid.shape
    Q = codes.shape[0]
    dtype = mean.dtype
    site = jnp.arange(S)
    in_range = ((site[None, :] >= begins[:, None])
                & (site[None, :] < (begins + spans)[:, None]))
    in_range = in_range.astype(dtype)
    scores = jnp.einsum("qs,es->qe", in_range, mean,
                        preferred_element_type=dtype, precision=_PP)
    rdt = resid.dtype

    if Q * C * S * jnp.dtype(rdt).itemsize <= 64 * 1024 * 1024:
        # one [Q, C*S] x [C*S, E] matmul: C separate [Q,S]x[S,E] matmuls
        # are too small to fill the MXU and serialize behind each other
        # (measured ~4x slower at bench shapes); the masked one-hot temp
        # is affordable below ~64 MB (long-alignment / huge-chunk shapes
        # keep the O(Q*S)-memory segmented loop, tests/test_memory.py)
        oh = (codes[:, None, :] == jnp.arange(C)[None, :, None])
        oh = oh.astype(rdt) * in_range[:, None, :].astype(rdt)
        return scores + jnp.einsum(
            "qx,ex->qe", oh.reshape(Q, C * S), resid.reshape(E, C * S),
            preferred_element_type=dtype)

    def per_char(c, acc):
        # fori_loop (not an unrolled python loop): keeps the per-character
        # [Q,S] selection buffers sequential — unrolled, XLA fuses them
        # back into one [Q,C,S] temp, exactly the blowup avoided on
        # huge-site chunks where the one-hot path above would need GBs
        r = jax.lax.dynamic_slice_in_dim(resid, c, 1, axis=1)[:, 0, :]
        sel = jnp.where(codes == c, in_range, 0.0).astype(rdt)
        return acc + jnp.einsum("qs,es->qe", sel, r,
                                preferred_element_type=dtype)

    return jax.lax.fori_loop(0, C, per_char, scores)


@jax.jit
def preplace_scores(table, codes, begins, spans):
    """Jitted :func:`preplace_scores_core` (the exact-path entry)."""
    return preplace_scores_core(table, codes, begins, spans)
