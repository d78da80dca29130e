"""Batched LDPC(174,91) sum-product belief propagation.

TPU-native replacement for ft8_lib's serial bp_decode (20 iterations per
candidate at /root/reference/rtlsdr_ft8d.c:1476): ALL candidates of all
channels run in lockstep as one vectorized message-passing schedule with
fixed iteration count and masked best-so-far tracking (the C early-exit
becomes a frozen minimum — identical results, compiler-friendly control
flow). Check-node updates use exact exclusive products over the <=7-entry
rows rather than division, so zero messages (masked boundary LLRs) are
numerically safe.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..protocol.constants import FT8_LDPC_M, FT8_LDPC_N
from ..protocol.parity_tables import LDPC_MN, LDPC_NM

# --- Static index tables -----------------------------------------------------
_NM = LDPC_NM.copy()                     # (83, 7) var indices, -1 pad
_NM_VALID = _NM >= 0

_MN = LDPC_MN.copy()                     # (174, 3) check indices

# Position of check m within MN[n] for each (m, j) with n = NM[m, j].
_NM_POS = np.zeros_like(_NM)
for m in range(FT8_LDPC_M):
    for j in range(7):
        n = _NM[m, j]
        if n >= 0:
            _NM_POS[m, j] = int(np.where(_MN[n] == m)[0][0])

# --- One-hot selection matrices: gathers become MXU matmuls ------------------
# The TPU hates small irregular gathers and loves GEMMs; every per-edge
# gather/scatter of the Tanner graph is expressed as multiplication by a
# static 0/1 matrix over the 581-slot (check m, slot j) edge layout.
_EDGES = FT8_LDPC_M * 7                     # 581 padded edge slots

# E (N,174) @ _SEL_VAR2EDGE (174,581) -> per-edge variable values
_SEL_VAR2EDGE = np.zeros((FT8_LDPC_N, _EDGES), np.float32)
# tov flat (N,522) @ _SEL_TOV2EDGE (522,581) -> per-edge tov[n, pos(m)]
_SEL_TOV2EDGE = np.zeros((FT8_LDPC_N * 3, _EDGES), np.float32)
for m in range(FT8_LDPC_M):
    for j in range(7):
        n = _NM[m, j]
        if n >= 0:
            _SEL_VAR2EDGE[n, m * 7 + j] = 1.0
            _SEL_TOV2EDGE[n * 3 + _NM_POS[m, j], m * 7 + j] = 1.0
# edge excl (N,581) @ _SEL_EDGE2TOV (581,522) -> tov'[n, i]
_SEL_EDGE2TOV = _SEL_TOV2EDGE.T.copy()
# [post, tov] (N,696) @ _SEL_V2E_COMBINED (696,581) -> post[n] - tov[n,pos]
# per edge in ONE GEMM (each output column has exactly two +/-1 entries)
_SEL_V2E_COMBINED = np.concatenate([_SEL_VAR2EDGE, -_SEL_TOV2EDGE], axis=0)
# parity counting: hard (N,174) @ _SEL_VAR2CHECK (174,83) -> ones per check
_SEL_VAR2CHECK = np.zeros((FT8_LDPC_N, FT8_LDPC_M), np.float32)
for m in range(FT8_LDPC_M):
    for j in range(7):
        if _NM[m, j] >= 0:
            _SEL_VAR2CHECK[_NM[m, j], m] = 1.0


def _fast_tanh(x):
    """Padé [3/2]-style rational tanh — the same approximation ft8_lib's
    bp_decode uses (fast_tanh in kgoba decode.c), and ~2x cheaper than the
    exact transcendental on the VPU."""
    x = jnp.clip(x, -4.97, 4.97)
    x2 = x * x
    return x * (945.0 + x2 * (105.0 + x2)) \
        / (945.0 + x2 * (420.0 + 15.0 * x2))


def _fast_atanh(x):
    """Rational atanh matching ft8_lib's fast_atanh; saturates instead of
    diverging near ±1, which caps message magnitudes exactly like the C."""
    x2 = x * x
    return x * (945.0 + x2 * (-735.0 + x2 * 64.0)) \
        / (945.0 + x2 * (-1050.0 + x2 * 225.0))


# The Tanner-graph GEMMs run at default (bf16x3-class) precision: the
# one-hot selection matmuls are exact in structure, BP is soft-decision
# robust to value rounding (ft8_lib's own bp_decode uses rational tanh
# APPROXIMATIONS, kgoba decode.c), and CRC-14 gates every decode. This is
# +20% whole-pipeline throughput on v5e. FT8_TPU_EXACT=1 restores
# six-pass float32 GEMMs for bit-stable cross-platform comparisons.
import os as _os

_PRECISION = (jax.lax.Precision.HIGHEST
              if _os.environ.get("FT8_TPU_EXACT") == "1"
              else jax.lax.Precision.DEFAULT)
_MM = dict(precision=_PRECISION, preferred_element_type=jnp.float32)


# tov_j = -2 atanh(prod_{j'!=j} tanh(-V_{j'}/2)): pulling the minus signs
# out of the (degree-1)-term product and through the odd atanh leaves an
# overall (-1)^degree factor that the sign-magnitude min-sum form needs
# explicitly (degree 6 rows -> +1, degree 7 rows -> -1).
_DEG_PARITY = np.where((_NM_VALID.sum(axis=1, keepdims=True) % 2)
                       .astype(bool), -1.0, 1.0).astype(np.float32)  # (83,1)


@functools.partial(jax.jit,
                   static_argnames=("max_iters", "return_posterior"))
def bp_decode_minsum(llr: jax.Array, max_iters: int = 20,
                     alpha: float = 0.75,
                     return_posterior: bool = False):
    """Normalized min-sum variant of bp_decode.

    Check-node tanh/atanh products become sign products and exclusive mins
    (the classic hardware LDPC decoder); alpha=0.75 normalization keeps it
    within ~0.1 dB of sum-product on this code. Roughly halves the BP loop
    cost. Same interface and best-iteration tracking as bp_decode
    (return_posterior included — the deep-decode rungs require it).
    """
    batch_shape = llr.shape[:-1]
    llr2 = llr.reshape((-1, FT8_LDPC_N))
    N = llr2.shape[0]

    sel_v2e_combined = jnp.asarray(_SEL_V2E_COMBINED)
    edge2tov = jnp.asarray(_SEL_EDGE2TOV)
    var2check = jnp.asarray(_SEL_VAR2CHECK)
    edge_valid = jnp.asarray(_NM_VALID.reshape(-1))
    deg_parity = jnp.asarray(_DEG_PARITY)               # (83, 1)

    zero = llr2[:, :1] * 0.0
    tov0 = jnp.zeros((N, FT8_LDPC_N * 3), llr2.dtype) + zero
    best_err0 = jnp.full((N,), FT8_LDPC_M, jnp.int32) \
        + zero[:, 0].astype(jnp.int32)
    best_hard0 = jnp.zeros((N, FT8_LDPC_N), jnp.int8) \
        + zero.astype(jnp.int8)

    BIG = jnp.float32(1e9)

    def body(_, state):
        tov, best_err, best_hard = state
        tov3 = tov.reshape(N, FT8_LDPC_N, 3)
        post = llr2 + jnp.sum(tov3, axis=-1)
        hard = (post > 0)
        hardf = hard.astype(jnp.float32)
        cnt = jnp.dot(hardf, var2check, **_MM)
        errors = jnp.sum(jnp.mod(cnt, 2.0), axis=-1).astype(jnp.int32)
        allzero = ~jnp.any(hard, axis=-1)
        errors = jnp.where(allzero, FT8_LDPC_M, errors)
        better = errors < best_err
        best_err = jnp.where(better, errors, best_err)
        best_hard = jnp.where(better[..., None], hard.astype(jnp.int8),
                              best_hard)

        pt = jnp.concatenate([post, tov], axis=-1)       # (N, 696)
        v = jnp.dot(pt, sel_v2e_combined, **_MM).reshape(N, FT8_LDPC_M, 7)
        mag = jnp.where(edge_valid.reshape(FT8_LDPC_M, 7), jnp.abs(v), BIG)
        sgn = jnp.where(edge_valid.reshape(FT8_LDPC_M, 7) & (v < 0),
                        -1.0, 1.0)

        # exclusive min via 7 static masked variants (argmin/one_hot inside
        # the loop crashes the Mosaic/XLA-TPU compile helper)
        mins = []
        for j in range(7):
            mask_j = np.ones(7, bool); mask_j[j] = False
            mins.append(jnp.min(jnp.where(jnp.asarray(mask_j), mag, BIG),
                                axis=-1))
        excl_min = jnp.stack(mins, axis=-1)              # (N, 83, 7)

        # sign product via negative-count parity (float prod reduce was one
        # suspect in a TPU compile-helper crash; parity is also cheaper)
        neg = (sgn < 0).astype(jnp.float32)
        nneg = jnp.sum(neg, axis=-1, keepdims=True)
        s_total = 1.0 - 2.0 * jnp.mod(nneg, 2.0)
        excl_sgn = s_total * sgn                          # s^2 = 1

        # tov'_j = (-1)^(deg) * excl_sign * alpha * excl_min, with the
        # (-1)^(degree-1+1) factor folded into deg_parity
        msg = deg_parity[None, :, :] * excl_sgn * (alpha * excl_min)
        tov_new = jnp.dot(msg.reshape(N, _EDGES), edge2tov, **_MM)
        return tov_new, best_err, best_hard

    tov_f, best_err, best_hard = jax.lax.fori_loop(
        0, max_iters, body, (tov0, best_err0, best_hard0))
    hard_out = best_hard.reshape(batch_shape + (FT8_LDPC_N,))
    err_out = best_err.reshape(batch_shape)
    if return_posterior:
        post = llr2 + jnp.sum(tov_f.reshape(N, FT8_LDPC_N, 3), axis=-1)
        return hard_out, err_out, post.reshape(batch_shape + (FT8_LDPC_N,))
    return hard_out, err_out


@functools.partial(jax.jit,
                   static_argnames=("max_iters", "return_posterior"))
def bp_decode(llr: jax.Array, max_iters: int = 20,
              return_posterior: bool = False):
    """Decode a batch of LLR vectors.

    Args:
      llr: (..., 174) float32, positive = bit 1 (ft8_lib convention).
      max_iters: fixed BP iteration count (reference uses 20).
      return_posterior: also return the final-iteration posterior LLRs
        (..., 174) — the sharpened beliefs OSD reprocesses on BP failures.

    Returns:
      (hard, num_errors[, posterior]): (..., 174) int8 hard decisions of
      the best iteration and (...,) int32 unsatisfied-check counts
      (0 = success).
    """
    batch_shape = llr.shape[:-1]
    llr2 = llr.reshape((-1, FT8_LDPC_N))
    N = llr2.shape[0]

    sel_v2e_combined = jnp.asarray(_SEL_V2E_COMBINED)
    edge2tov = jnp.asarray(_SEL_EDGE2TOV)
    var2check = jnp.asarray(_SEL_VAR2CHECK)
    edge_valid = jnp.asarray(_NM_VALID.reshape(-1))          # (581,)

    # Derive the loop carry from the input so it inherits any shard_map
    # varying-axis types (pvary) — plain constants would mismatch the body
    # outputs when bp_decode runs inside a manual-sharding region.
    zero = llr2[:, :1] * 0.0
    tov0 = jnp.zeros((N, FT8_LDPC_N * 3), llr2.dtype) + zero
    best_err0 = jnp.full((N,), FT8_LDPC_M, jnp.int32) \
        + zero[:, 0].astype(jnp.int32)
    best_hard0 = jnp.zeros((N, FT8_LDPC_N), jnp.int8) \
        + zero.astype(jnp.int8)

    def body(_, state):
        tov, best_err, best_hard = state
        tov3 = tov.reshape(N, FT8_LDPC_N, 3)
        post = llr2 + jnp.sum(tov3, axis=-1)                 # (N, 174)
        hard = (post > 0)
        hardf = hard.astype(jnp.float32)
        # parity via GEMM: ones-per-check mod 2
        cnt = jnp.dot(hardf, var2check, **_MM)               # (N, 83)
        errors = jnp.sum(jnp.mod(cnt, 2.0), axis=-1).astype(jnp.int32)
        allzero = ~jnp.any(hard, axis=-1)
        errors = jnp.where(allzero, FT8_LDPC_M, errors)
        better = errors < best_err
        best_err = jnp.where(better, errors, best_err)
        best_hard = jnp.where(better[..., None], hard.astype(jnp.int8),
                              best_hard)

        # Variable -> check: Tnm = posterior[n] - tov[n, pos(m)] per edge,
        # as ONE concatenated GEMM: [post, tov] @ [var2edge; -tov2edge]
        pt = jnp.concatenate([post, tov], axis=-1)           # (N, 696)
        diff = jnp.dot(pt, sel_v2e_combined, **_MM)          # (N, 581)
        toc = _fast_tanh(-0.5 * diff)
        toc = jnp.where(edge_valid, toc, 1.0)
        toc7 = toc.reshape(N, FT8_LDPC_M, 7)

        # Exclusive products per check row via prefix/suffix products
        # (2*6 muls instead of 7 masked 6-term products)
        fwd = [jnp.ones_like(toc7[..., 0])]
        bwd = [jnp.ones_like(toc7[..., 0])]
        for j in range(6):
            fwd.append(fwd[-1] * toc7[..., j])
            bwd.append(bwd[-1] * toc7[..., 6 - j])
        excl = jnp.stack([fwd[j] * bwd[6 - j] for j in range(7)],
                         axis=-1).reshape(N, _EDGES)

        # Check -> variable scatter via GEMM
        val = jnp.dot(excl, edge2tov, **_MM)                 # (N, 522)
        val = jnp.clip(val, -0.999999, 0.999999)
        tov_new = -2.0 * _fast_atanh(val)
        return tov_new, best_err, best_hard

    tov_f, best_err, best_hard = jax.lax.fori_loop(
        0, max_iters, body, (tov0, best_err0, best_hard0))
    hard_out = best_hard.reshape(batch_shape + (FT8_LDPC_N,))
    err_out = best_err.reshape(batch_shape)
    if return_posterior:
        post = llr2 + jnp.sum(tov_f.reshape(N, FT8_LDPC_N, 3), axis=-1)
        return hard_out, err_out, post.reshape(batch_shape + (FT8_LDPC_N,))
    return hard_out, err_out


# --- CRC-14 as a GF(2) matrix (MXU-friendly batched check) -------------------
def _crc_matrix():
    from ..protocol.crc import payload_crc
    mat = np.zeros((77, 14), dtype=np.int32)
    base = np.zeros(77, dtype=np.uint8)
    c0 = payload_crc(base)
    for i in range(77):
        v = base.copy(); v[i] = 1
        c = payload_crc(v) ^ c0
        mat[i] = [(c >> (13 - b)) & 1 for b in range(14)]
    assert c0 == 0
    return mat

_CRC_MAT = _crc_matrix()


def crc_check(hard91: jax.Array) -> jax.Array:
    """Vectorized CRC-14 check on (..., >=91) hard bits; True = CRC ok."""
    payload = hard91[..., :77].astype(jnp.int32)
    expect = (payload @ jnp.asarray(_CRC_MAT)) % 2
    got = hard91[..., 77:91].astype(jnp.int32)
    return jnp.all(expect == got, axis=-1)


bp_decode_xla = bp_decode

# FT8_TPU_BP_PALLAS selects the single-kernel VMEM-resident Pallas
# decoder (ops/ldpc_pallas.py) — the TPU default since the round-5
# hardware A/B (ops/knobs.py); XLA on CPU and under =0. The knob lives
# HERE so every consumer (pipeline, sharded dense path) resolves the
# same implementation. FT8_TPU_EXACT=1 wins over it (the anchor's
# six-pass f32 GEMMs).
def bp_decode(llr, max_iters: int = 20,            # noqa: F811
              return_posterior: bool = False):
    from .knobs import pallas_selected
    if pallas_selected("FT8_TPU_BP_PALLAS", exact_wins=True):
        from .ldpc_pallas import bp_decode_pallas
        return bp_decode_pallas(llr, max_iters, return_posterior)
    return bp_decode_xla(llr, max_iters, return_posterior)
