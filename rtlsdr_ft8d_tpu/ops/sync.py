"""Costas sync-correlation search over the waterfall, fully batched.

TPU-native replacement for ft8_lib's ft8_find_sync as invoked by the
reference (/root/reference/rtlsdr_ft8d.c:1450, min_score=10, top 120): the
7x7 Costas pattern at symbol offsets 0/36/72 is scored at EVERY candidate
cell (time_sub, freq_sub, time_offset in [-12, 24), freq_offset in
[0, 249)) at once as a sum of statically-shifted views of the waterfall —
no data-dependent control flow, one fused elementwise reduction, followed by
a single jax.lax.top_k.

Scoring (matching kgoba/ft8_lib's neighbor-contrast score): for each of the
21 sync symbols, accumulate the difference between the expected Costas tone
cell and (a) one bin lower, (b) one bin higher, (c) same bin one symbol
earlier, (d) same bin one symbol later — each term gated by the same
boundary conditions as the C loop, final score = C-style truncating division
by the number of accumulated terms.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..protocol.constants import (COSTAS_OFFSETS, COSTAS_PATTERN,
                                  K_MAX_CANDIDATES, NUM_BIN, NUM_BLOCKS)

TIME_OFFSET_MIN = -12
TIME_OFFSET_MAX = 24           # exclusive
NUM_TIME_OFFSETS = TIME_OFFSET_MAX - TIME_OFFSET_MIN   # 36
NUM_FREQ_OFFSETS = NUM_BIN - 7                          # 249


def sync_scores(wf: jax.Array) -> jax.Array:
    """Score all candidate alignments.

    Args:
      wf: (..., 92, 2, 2, 256) uint8 waterfall.

    Returns:
      (..., 2, 2, NUM_TIME_OFFSETS, NUM_FREQ_OFFSETS) int32 scores, indexed
      [time_sub][freq_sub][time_offset - TIME_OFFSET_MIN][freq_offset].
    """
    w = wf.astype(jnp.int32)                     # (..., 92, 2, 2, 256)
    # Move block axis last-but-one for freq slicing convenience:
    # reorder to (..., time_sub, freq_sub, block, bin)
    w = jnp.moveaxis(w, -4, -2)                  # (..., 2, 2, 92, 256)

    batch_shape = w.shape[:-4]
    out_shape = batch_shape + (2, 2, NUM_TIME_OFFSETS, NUM_FREQ_OFFSETS)
    score = jnp.zeros(out_shape, jnp.int32)
    count = jnp.zeros(out_shape, jnp.int32)

    to = np.arange(TIME_OFFSET_MIN, TIME_OFFSET_MAX)        # (36,)

    def block_plane(delta: int):
        """wf values at block (time_offset + delta) for all time offsets.

        Returns (..., 2, 2, 36, 256) with out-of-range blocks zero-filled,
        plus the validity mask (36,) -> broadcastable.
        """
        blocks = to + delta
        valid = (blocks >= 0) & (blocks < NUM_BLOCKS)
        idx = np.clip(blocks, 0, NUM_BLOCKS - 1)
        plane = w[..., idx, :]                  # (..., 2, 2, 36, 256)
        mask = jnp.asarray(valid)[..., :, None]  # (36, 1)
        return plane, mask, valid

    for m in COSTAS_OFFSETS:
        for k in range(7):
            sm = int(COSTAS_PATTERN[k])
            plane, mask, valid_np = block_plane(m + k)
            # expected-tone cell across all freq offsets: bins fo+sm
            p_sm = plane[..., sm:sm + NUM_FREQ_OFFSETS]
            zero = jnp.zeros_like(p_sm)
            m_i = mask.astype(jnp.int32)

            if sm > 0:
                p_lo = plane[..., sm - 1:sm - 1 + NUM_FREQ_OFFSETS]
                score = score + jnp.where(mask, p_sm - p_lo, zero)
                count = count + m_i
            if sm < 7:
                p_hi = plane[..., sm + 1:sm + 1 + NUM_FREQ_OFFSETS]
                score = score + jnp.where(mask, p_sm - p_hi, zero)
                count = count + m_i
            if k > 0:
                prev, prev_mask, _ = block_plane(m + k - 1)
                # C condition: block valid AND block > 0  (block-1 >= 0)
                blocks = to + m + k
                cond = valid_np & (blocks > 0)
                cmask = mask & jnp.asarray(cond)[..., :, None]
                p_pv = prev[..., sm:sm + NUM_FREQ_OFFSETS]
                score = score + jnp.where(cmask, p_sm - p_pv, zero)
                count = count + cmask.astype(jnp.int32)
            if k < 6:
                nxt, _, _ = block_plane(m + k + 1)
                blocks = to + m + k
                cond = valid_np & (blocks + 1 < NUM_BLOCKS)
                cmask = mask & jnp.asarray(cond)[..., :, None]
                p_nx = nxt[..., sm:sm + NUM_FREQ_OFFSETS]
                score = score + jnp.where(cmask, p_sm - p_nx, zero)
                count = count + cmask.astype(jnp.int32)

    # C truncating division (toward zero, negative scores possible)
    count = jnp.maximum(count, 1)
    q = jnp.abs(score) // count
    return jnp.sign(score) * q


CHUNK = 16   # freq-offset cells per first-stage chunk (100 Hz of band)
CHUNK_K = 4  # survivors per chunk; >1 signal per 100 Hz chunk is rare


@functools.partial(jax.jit, static_argnames=("num_candidates", "exact"))
def find_sync(wf: jax.Array, num_candidates: int = K_MAX_CANDIDATES,
              exact: bool = False):
    """Top-K candidates by sync score.

    Returns dict of (..., K) arrays: score, time_sub, freq_sub, time_offset,
    freq_offset. Candidates below min_score are NOT filtered here — the
    caller masks on score (matching the reference's `score < K_MIN_SCORE`
    skip at rtlsdr_ft8d.c:1467).

    By default the top-K runs in two stages (top-CHUNK_K per 16-cell freq
    chunk, then global top-K over survivors) — a large win over a full sort
    of all 35,856 cells on TPU. This is exact unless more than CHUNK_K of
    the true global top-K fall in the SAME (time_sub, freq_sub, time_offset,
    100 Hz) chunk, which requires >CHUNK_K interleaved signals within 100 Hz
    at identical time alignment; `exact=True` forces the full sort.
    """
    scores = sync_scores(wf)
    flat = scores.reshape(scores.shape[:-4] + (-1,))
    if exact:
        top, idx = jax.lax.top_k(flat, num_candidates)
    else:
        batch_shape = flat.shape[:-1]
        n = flat.shape[-1]
        pad = (-n) % CHUNK
        flatp = jnp.pad(flat, [(0, 0)] * len(batch_shape) + [(0, pad)],
                        constant_values=-(1 << 20))
        chunks = flatp.reshape(batch_shape + (-1, CHUNK))
        v1, i1 = jax.lax.top_k(chunks, CHUNK_K)          # (..., C, CHUNK_K)
        base = (jnp.arange(chunks.shape[-2]) * CHUNK)[..., :, None]
        gidx = (i1 + base).reshape(batch_shape + (-1,))
        v1 = v1.reshape(batch_shape + (-1,))
        top, sel = jax.lax.top_k(v1, num_candidates)
        idx = jnp.take_along_axis(gidx, sel, axis=-1)
    # unravel [ts][fs][to][fo]
    fo = idx % NUM_FREQ_OFFSETS
    rest = idx // NUM_FREQ_OFFSETS
    to = rest % NUM_TIME_OFFSETS + TIME_OFFSET_MIN
    rest = rest // NUM_TIME_OFFSETS
    fs = rest % 2
    ts = rest // 2
    return {"score": top, "time_sub": ts, "freq_sub": fs,
            "time_offset": to, "freq_offset": fo}
