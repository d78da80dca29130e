"""LDPC(174,91) sum-product BP as ONE Pallas TPU kernel.

The XLA bp_decode (ops/ldpc.py) runs 20 sequential iterations of three
small GEMMs plus element-wise work; every iteration round-trips ~15 MB
of messages through HBM because XLA materializes GEMM operands. This
kernel keeps the WHOLE decoder state — LLRs, check->variable messages,
best-so-far tracking and all five static selection matrices (~5 MB) —
resident in VMEM for all `max_iters` iterations: HBM traffic drops to
the LLR block in and the decisions out.

Same message schedule and fast-tanh/atanh rationals as ops/ldpc.py
(which mirrors ft8_lib's bp_decode as driven by
/root/reference/rtlsdr_ft8d.c:1476). One structural difference: the
exclusive check-row products are computed in the LOG domain as a single
GEMM against a static group-exclusion matrix G (G[e,e'] = 1 iff e and
e' are valid edge slots of the same check and e != e'):

    excl[e] = sign_parity(e) * exp( sum_{e'} G[e,e'] * log|toc[e']| )

which is lane-friendly (no stride-7 shuffles) and MXU work. A zero
message anywhere in the row drives exp() to 0 for every OTHER slot of
the row while its own slot excludes it — the same zero-safety the
explicit exclusive products have. Value differences vs the XLA path
are last-ulp class; decode parity is verified by the same instruments
as every precision decision (tests, bench ladder, golden fixtures).

Opt-in via FT8_TPU_BP_PALLAS=1, resolved at the ops layer
(ops/ldpc.py — "the knob lives HERE") until measured on hardware;
`interpret=True` path is used on CPU (tests).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..protocol.constants import FT8_LDPC_M, FT8_LDPC_N
from .ldpc import (_EDGES, _NM_VALID, _SEL_EDGE2TOV, _SEL_TOV2EDGE,
                   _SEL_VAR2CHECK, _SEL_VAR2EDGE, _fast_atanh, _fast_tanh)

BLOCK = 256                      # candidates per kernel instance

# Group-exclusion matrix for the log-domain exclusive products.
_G_EXCL = np.zeros((_EDGES, _EDGES), np.float32)
for m in range(FT8_LDPC_M):
    for j in range(7):
        if not _NM_VALID[m, j]:
            continue
        for j2 in range(7):
            if j2 != j and _NM_VALID[m, j2]:
                _G_EXCL[m * 7 + j2, m * 7 + j] = 1.0

# tov (N, 522) -> per-variable sum (N, 174)
_SUM_TOV = np.zeros((FT8_LDPC_N * 3, FT8_LDPC_N), np.float32)
for n in range(FT8_LDPC_N):
    _SUM_TOV[n * 3:n * 3 + 3, n] = 1.0

_EDGE_VALID_F = _NM_VALID.reshape(-1).astype(np.float32)


def _bp_kernel(llr_ref, v2e_ref, t2e_ref, e2t_ref, g_ref, sumt_ref,
               v2c_ref, valid_ref, *out_refs, max_iters, with_posterior):
    llr = llr_ref[:]                                   # (BLOCK, 174)
    v2e = v2e_ref[:]                                   # (174, 581)
    t2e = t2e_ref[:]                                   # (522, 581)
    e2t = e2t_ref[:]                                   # (581, 522)
    g = g_ref[:]                                       # (581, 581)
    sumt = sumt_ref[:]                                 # (522, 174)
    v2c = v2c_ref[:]                                   # (174, 83)
    valid = valid_ref[:]                               # (1, 581)

    f32 = jnp.float32
    bf16 = jnp.bfloat16
    dot = functools.partial(jnp.dot, preferred_element_type=f32)
    # 0/1 x 0/1 GEMMs are bf16-EXACT (integer products, counts <= 7 sum
    # exactly in f32): run them as one-pass bf16 MXU work instead of
    # multi-pass f32 emulation — bit-identical outputs. (A hi+lo bf16
    # split of the VALUE GEMMs measured 1.18 -> 0.90 ms but LOST one
    # knife-edge decode in 512 channels — loss-direction divergence, so
    # it was rejected per the precision policy; the value GEMMs stay f32.)
    v2c_bf = v2c.astype(bf16)
    g_bf = g.astype(bf16)

    def body(_, state):
        tov, best_err, best_hard = state
        post = llr + dot(tov, sumt)                    # (B, 174)
        hard = (post > 0).astype(f32)
        cnt = dot(hard.astype(bf16), v2c_bf)           # (B, 83) exact
        par = cnt - 2.0 * jnp.floor(cnt * 0.5)         # mod 2, exact in f32
        err = jnp.sum(par, axis=-1, keepdims=True)     # (B, 1)
        allzero = jnp.sum(hard, axis=-1, keepdims=True) == 0.0
        err = jnp.where(allzero, f32(FT8_LDPC_M), err)
        better = err < best_err
        best_err = jnp.where(better, err, best_err)
        best_hard = jnp.where(better, hard, best_hard)

        # variable -> check per edge: post[n] - tov[n, pos(m)]
        # (two dots, not a lane-concat: Mosaic-friendlier)
        v = dot(post, v2e) - dot(tov, t2e)             # (B, 581)
        toc = _fast_tanh(-0.5 * v)
        toc = jnp.where(valid > 0, toc, 1.0)

        # log-domain exclusive products (see module docstring)
        lg = jnp.log(jnp.maximum(jnp.abs(toc), 1e-30))
        neg = (toc < 0).astype(bf16)
        ex_lg = dot(lg, g)
        ex_ng = dot(neg, g_bf)                         # 0/1 counts, exact
        ex_sgn = 1.0 - 2.0 * (ex_ng - 2.0 * jnp.floor(ex_ng * 0.5))
        excl = ex_sgn * jnp.exp(ex_lg)

        val = dot(excl, e2t)                           # (B, 522)
        val = jnp.clip(val, -0.999999, 0.999999)
        return -2.0 * _fast_atanh(val), best_err, best_hard

    tov0 = jnp.zeros(llr.shape[:1] + (FT8_LDPC_N * 3,), f32)
    err0 = jnp.full(llr.shape[:1] + (1,), f32(FT8_LDPC_M))
    hard0 = jnp.zeros_like(llr)
    tov_f, best_err, best_hard = jax.lax.fori_loop(
        0, max_iters, body, (tov0, err0, hard0))

    out_refs[0][:] = best_hard
    out_refs[1][:] = best_err
    if with_posterior:
        out_refs[2][:] = llr + dot(tov_f, sumt)


@functools.partial(jax.jit,
                   static_argnames=("max_iters", "return_posterior",
                                    "interpret"))
def bp_decode_pallas(llr: jax.Array, max_iters: int = 20,
                     return_posterior: bool = False,
                     interpret: bool | None = None):
    """Drop-in bp_decode with the whole BP loop in one VMEM-resident
    Pallas kernel. Same returns as ops/ldpc.bp_decode."""
    from jax.experimental import pallas as pl

    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"

    batch_shape = llr.shape[:-1]
    llr2 = llr.reshape((-1, FT8_LDPC_N)).astype(jnp.float32)
    n = llr2.shape[0]
    pad = (-n) % BLOCK
    if pad:
        llr2 = jnp.pad(llr2, ((0, pad), (0, 0)))
    nblk = llr2.shape[0] // BLOCK

    kern = functools.partial(_bp_kernel, max_iters=max_iters,
                             with_posterior=return_posterior)
    mats = (jnp.asarray(_SEL_VAR2EDGE), jnp.asarray(_SEL_TOV2EDGE),
            jnp.asarray(_SEL_EDGE2TOV), jnp.asarray(_G_EXCL),
            jnp.asarray(_SUM_TOV), jnp.asarray(_SEL_VAR2CHECK),
            jnp.asarray(_EDGE_VALID_F)[None, :])
    fixed = lambda i: (0, 0)
    out_specs = [
        pl.BlockSpec((BLOCK, FT8_LDPC_N), lambda i: (i, 0)),
        pl.BlockSpec((BLOCK, 1), lambda i: (i, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((llr2.shape[0], FT8_LDPC_N), jnp.float32),
        jax.ShapeDtypeStruct((llr2.shape[0], 1), jnp.float32),
    ]
    if return_posterior:
        out_specs.append(pl.BlockSpec((BLOCK, FT8_LDPC_N),
                                      lambda i: (i, 0)))
        out_shape.append(jax.ShapeDtypeStruct(
            (llr2.shape[0], FT8_LDPC_N), jnp.float32))
    outs = pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=[pl.BlockSpec((BLOCK, FT8_LDPC_N), lambda i: (i, 0))]
        + [pl.BlockSpec(m.shape, fixed) for m in mats],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(llr2, *mats)

    hard_f, err_f = outs[0], outs[1]
    hard = hard_f[:n].astype(jnp.int8).reshape(batch_shape + (FT8_LDPC_N,))
    err = err_f[:n, 0].astype(jnp.int32).reshape(batch_shape)
    if return_posterior:
        return hard, err, outs[2][:n].reshape(batch_shape + (FT8_LDPC_N,))
    return hard, err
