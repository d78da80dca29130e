"""Device-side ordered-statistics decoding (FT8_TPU_OSD_DEVICE=1).

Same algorithm and acceptance rule as ops/osd.py's host paths (greedy
most-reliable-basis GF(2) elimination + rank-<=2 reprocessing + CRC
shortlist), expressed as one jittable batched graph so the deep-decode
stack never leaves the device (ROADMAP r3 #5: the busy-band host OSD
leg is ~230 ms; on-device the same work is a ~10 ms tail on the decode
graph and the posterior tensors stop crossing the PCIe/relay boundary).

Design notes (why this maps well to TPU):
  * The greedy MRB elimination is inherently sequential over the 174
    reliability-ordered rows, but every step is the SAME dense batched
    work (one masked XOR-reduce over the 91 stored rows + one rank-1
    back-elimination), so it is a `lax.fori_loop` whose body is pure
    elementwise + small reductions over a (N, 91, 91) state — XLA keeps
    it fused; no data-dependent shapes anywhere.
  * GF(2) arithmetic rides uint8 0/1 planes: XOR-reduce == integer sum
    & 1 (exact), matrix products over GF(2) == float32 GEMM mod 2
    (sums <= 174, exactly representable) — the reprocessing stage is
    plain MXU work.
  * Reliability sorts use stable argsort exactly like the numpy path so
    tie-breaking (and therefore decode lists) match bit-for-bit; the
    only numeric difference is float32 vs float64 soft-discrepancy
    accumulation, which tests pin down on the shared fuzz corpus.

Opt-in via FT8_TPU_OSD_DEVICE=1 (FT8_TPU_EXACT=1 wins and keeps the
host float64 path); resolved at call time in pipeline._merge_osd_decodes
so a daemon/test can flip it per-process without module reloads.
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..protocol.constants import FT8_LDPC_K, FT8_LDPC_N


def device_osd_enabled() -> bool:
    return (os.environ.get("FT8_TPU_OSD_DEVICE") == "1"
            and os.environ.get("FT8_TPU_EXACT") != "1")


@functools.cache
def _consts_np():
    from .ldpc import _CRC_MAT
    from .osd import encode_matrix
    E = np.asarray(encode_matrix(), np.uint8)            # (174, 91)
    return E, E.astype(np.float32), np.asarray(_CRC_MAT, np.float32)


def _consts():
    # numpy-cached, converted per trace: caching jnp arrays would leak
    # tracers out of the first jit trace that materialized them
    E, Ef, crc = _consts_np()
    return jnp.asarray(E), jnp.asarray(Ef), jnp.asarray(crc)


def _mrb_loop(perm, k):
    """Batched greedy most-reliable-basis elimination (the lockstep
    algorithm of ops/osd.py:_mrb_batch, on uint8 0/1 planes).

    Returns (basis_step (N, k) perm-step of each chosen slot,
             A (N, k, k) basis inverse rows over the slot columns,
             ok (N,) full-rank flag)."""
    E, _, _ = _consts()
    N = perm.shape[0]
    Mperm = E[perm]                                     # (N, 174, k)

    def body(st):
        j, R, A, has_piv, nbasis, basis_step = st
        Mj = Mperm[:, j]                                # (N, k)
        coeff = Mj & has_piv
        # stored rows are RREF (one stored row per pivot column), so one
        # masked XOR-reduce fully reduces the new row; XOR == sum & 1
        new_r = (jnp.sum(R * coeff[:, :, None], axis=1,
                         dtype=jnp.int32) & 1).astype(jnp.uint8) ^ Mj
        slot = jnp.minimum(nbasis, k - 1)
        slot_oh = jax.nn.one_hot(slot, k, dtype=jnp.uint8)
        new_a = (jnp.sum(A * coeff[:, :, None], axis=1,
                         dtype=jnp.int32) & 1).astype(jnp.uint8) ^ slot_oh
        piv = jnp.argmax(new_r, axis=1)                 # first set bit
        take = (nbasis < k) & (jnp.max(new_r, axis=1) > 0)
        # back-eliminate the new pivot from stored rows (keeps RREF)
        pivbit = jnp.take_along_axis(R, piv[:, None, None],
                                     axis=2)[:, :, 0]
        hit = ((pivbit & has_piv) > 0) & take[:, None]
        R = R ^ jnp.where(hit[:, :, None], new_r[:, None, :],
                          jnp.uint8(0))
        A = A ^ jnp.where(hit[:, :, None], new_a[:, None, :],
                          jnp.uint8(0))
        store = (jax.nn.one_hot(piv, k, dtype=jnp.uint8)
                 * take[:, None].astype(jnp.uint8))
        R = jnp.where(store[:, :, None] > 0, new_r[:, None, :], R)
        A = jnp.where(store[:, :, None] > 0, new_a[:, None, :], A)
        has_piv = has_piv | store
        basis_step = jnp.where((slot_oh > 0) & take[:, None], j,
                               basis_step)
        nbasis = nbasis + take.astype(nbasis.dtype)
        return j + 1, R, A, has_piv, nbasis, basis_step

    # while_loop, not fori: every candidate's basis usually completes
    # after ~95-105 of the 174 reliability-ordered rows (random GF(2)
    # rank excess is small), so the all-done early exit cuts ~40% of
    # the elimination steps; completed candidates are masked no-ops
    # either way, so the result is bit-identical
    st = (jnp.int32(0),
          jnp.zeros((N, k, k), jnp.uint8),              # RREF rows
          jnp.zeros((N, k, k), jnp.uint8),              # aug (inverse)
          jnp.zeros((N, k), jnp.uint8),                 # pivot occupancy
          jnp.zeros(N, jnp.int32),
          jnp.zeros((N, k), jnp.int32))
    n_rows = perm.shape[1]
    _, R, A, has_piv, nbasis, basis_step = jax.lax.while_loop(
        lambda s: (s[0] < n_rows) & ~jnp.all(s[4] >= k), body, st)
    return basis_step, A, nbasis >= k


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def osd_device(llrs, max_norm: float = 0.12, depth: int = 24,
               pair_depth: int = 10, crc_top: int = 8):
    """OSD a batch (N, 174) of posterior LLRs on device.

    Returns (msgs (N, 91) uint8, accept (N,) bool) with the exact
    acceptance rule of ops/osd.py:osd_batch (CRC-valid lowest-discrepancy
    reprocessed codeword, normalized soft discrepancy <= max_norm)."""
    E, Ef, crc_mat = _consts()
    k = FT8_LDPC_K
    N = llrs.shape[0]
    llrs = llrs.astype(jnp.float32)
    rel = jnp.abs(llrs)
    hard = (llrs > 0).astype(jnp.uint8)
    perm = jnp.argsort(-rel, axis=1, stable=True)
    basis_step, A, ok_basis = _mrb_loop(perm, k)
    pos = jnp.take_along_axis(perm, basis_step, axis=1)      # (N, k)
    y0 = jnp.take_along_axis(hard, pos, axis=1).astype(jnp.int32)

    # base solve m0 = inv @ y0: bit d = parity(<inverse row d, y0>)
    m0 = (jnp.einsum('nds,ns->nd', A.astype(jnp.int32), y0) & 1) \
        .astype(jnp.float32)
    cw0 = (jnp.einsum('nd,jd->nj', m0, Ef) % 2.0).astype(jnp.uint8)

    # flip patterns over the weakest basis slots: flipping slot s toggles
    # the codeword by E @ inv[:, s] (see ops/osd.py:osd_batch_numpy)
    rel_b = jnp.take_along_axis(rel, pos, axis=1)
    order = jnp.argsort(rel_b, axis=1, stable=True)
    nw = max(depth, pair_depth)
    weak = order[:, :nw]                                     # (N, nw)
    icols = jnp.take_along_axis(
        A, jnp.broadcast_to(weak[:, None, :], (N, k, nw)), axis=2)
    colcw = (jnp.einsum('ndw,jd->nwj', icols.astype(jnp.float32), Ef)
             % 2.0).astype(jnp.uint8)                        # (N, nw, 174)

    from .osd import pair_indices
    pa, pb = pair_indices(pair_depth)
    cws = jnp.concatenate([
        cw0[:, None, :],
        cw0[:, None, :] ^ colcw[:, :depth],
        cw0[:, None, :] ^ colcw[:, pa] ^ colcw[:, pb],
    ], axis=1)                                               # (N, P, 174)
    diff = (cws != hard[:, None, :]).astype(jnp.float32)
    # the ONE non-binary GEMM here: rel is real-valued, and disc drives
    # both the shortlist ordering and the accept gate — pin HIGHEST so
    # the MXU doesn't decompose it to bf16 terms and diverge from the
    # host float32 ordering (the GF(2) einsums are 0/1-exact at any
    # precision)
    disc = jnp.einsum('npj,nj->np', diff, rel,
                      precision=jax.lax.Precision.HIGHEST)
    scale = jnp.maximum(jnp.mean(rel, axis=1) * FT8_LDPC_N, 1e-9)

    # CRC-check the crc_top lowest-discrepancy codewords per candidate
    sel = jnp.argsort(disc, axis=1, stable=True)[:, :crc_top]
    cand_cw = jnp.take_along_axis(cws, sel[:, :, None], axis=1)
    payload = cand_cw[:, :, :77].astype(jnp.float32)
    expect = jnp.einsum('ntj,jc->ntc', payload, crc_mat) % 2.0
    crc_ok = jnp.all(expect.astype(jnp.uint8) == cand_cw[:, :, 77:91],
                     axis=2) & jnp.any(cand_cw[:, :, :77] > 0, axis=2)
    good = crc_ok & ok_basis[:, None]
    has = jnp.any(good, axis=1)
    first = jnp.argmax(good, axis=1)
    sel_disc = jnp.take_along_axis(disc, sel, axis=1)
    first_norm = jnp.take_along_axis(sel_disc, first[:, None],
                                     axis=1)[:, 0] / scale
    best = jnp.take_along_axis(cand_cw, first[:, None, None],
                               axis=1)[:, 0]
    accept = has & (first_norm <= max_norm)
    msgs = jnp.where(accept[:, None], best[:, :k], jnp.uint8(0))
    return msgs, accept


def osd_device_both(post, post_coh, max_norm: float = 0.12,
                    depth: int = 24, pair_depth: int = 10,
                    crc_top: int = 8):
    """Run OSD on the triple-flavor posteriors and, where those reject,
    fall back to the block-coherent posteriors — one stacked device call
    covering both attempts of pipeline._merge_osd_decodes.

    Returns (msgs (N, 91) uint8, accept (N,) bool) as device arrays."""
    n = post.shape[0]
    stacked = jnp.concatenate([jnp.asarray(post, jnp.float32),
                               jnp.asarray(post_coh, jnp.float32)])
    msgs, accept = osd_device(stacked, max_norm, depth, pair_depth,
                              crc_top)
    m1, m2 = msgs[:n], msgs[n:]
    a1, a2 = accept[:n], accept[n:]
    return jnp.where(a1[:, None], m1, m2), a1 | a2
