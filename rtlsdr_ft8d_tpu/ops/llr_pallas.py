"""Flat-candidate tone-magnitude gather as a Pallas kernel (opt-in,
FT8_TPU_LLR_PALLAS=1).

The XLA flat LLR path (ops/llr.py:_tone_mags_flat) gathers 58 waterfall
rows per candidate through one big take (N*58 scattered HBM rows, then a
one-hot einsum). Here the WHOLE (ts, fs)-planar waterfall sits in VMEM
(64 channels x 4 planes x 104 x 256 uint8 = 6.8 MB, far under the 128 MB
v5e VMEM) and each candidate loads its (104, 256) plane — a dynamic
index on the LEADING dim, which Mosaic allows unconditionally — then
selects its 58 data-symbol rows with a (58, 104) one-hot MXU dot. (The
earlier design used two dynamic SUBLANE slices per candidate; Mosaic
requires dynamic sublane starts to be provably 8-aligned and it failed
hardware compilation — see the in-kernel comment.) The 8-tone column
select is a second one-hot MXU dot, batched G=16 candidates per grid
step so the (G*58, 256) x (256, G*8) pass fills full 128-lane tiles.

Zero-padding replaces the XLA path's clip+mask: plane rows are padded by
5 above / 7 below so every dt row index is in range, and out-of-window
symbols read zeros => max_set - max_clr = 0, exactly the masked XLA
logl. One-hot bf16 dots of integers <= 255 are exact (integers to 256
are bf16-representable), so s2 values are identical bits and decode
lists cannot change (tests/test_llr_pallas.py checks exact equality).

Falls back to the XLA formulation when the waterfall would not fit
VMEM (wideband batches) — the knob is safe to leave on everywhere.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ..protocol.constants import FT8_ND, GRAY_MAP, NUM_BIN, NUM_BLOCKS

_G = 16                    # candidates per grid step (fills 128 MXU lanes)
_PAD_TOP = 5               # covers slice start to+7 >= -5 (to >= -12)
_PAD_BOT = 7               # covers slice end to+43+29 <= 95+7 (to <= 23)
_ROWS = NUM_BLOCKS + _PAD_TOP + _PAD_BOT            # 104
# VMEM budget for the resident waterfall; beyond this fall back to XLA
_VMEM_LIMIT_BYTES = 48 * 1024 * 1024


def _kernel(plane_ref, to_ref, fo_ref, wfp_ref, out_ref):
    # Row selection is a one-hot MXU dot, NOT a dynamic slice: Mosaic
    # requires dynamic sublane starts be provably 8-aligned (the original
    # wfp_ref[p, pl.ds(t+7+PAD, 29), :] failed hardware compilation), but
    # a dynamic index on the LEADING dim is unrestricted, so each
    # candidate loads its whole (104, 256) plane and selects its 58 data-
    # symbol rows with a (58, 104) one-hot built from iota==t+sym.
    # One-hot dots of integers <= 255 are exact in bf16 (integers to 256
    # are representable), so s2 stays bit-identical to the XLA gather.
    j = pl.program_id(0) * _G
    gray = [int(v) for v in GRAY_MAP]
    # _DATA_SYM[k] = k + 7 + 7*(k//29) (ops/llr.py:20), built from iotas
    # in-kernel (pallas_call rejects captured array constants).
    rowid = jax.lax.broadcasted_iota(jnp.int32, (FT8_ND, _ROWS), 1)
    symid = jax.lax.broadcasted_iota(jnp.int32, (FT8_ND, _ROWS), 0)
    sym2d = symid + 7 + 7 * (symid // 29)               # (58, 104) static
    rows_parts = []
    want_parts = []
    for g in range(_G):
        p = plane_ref[j + g]
        t = to_ref[j + g]
        f = fo_ref[j + g]
        # Mosaic has no unsigned->float cast; uint8 -> int32 -> bf16 exact
        plane = wfp_ref[p].astype(jnp.int32).astype(jnp.bfloat16)
        prow = (rowid == (t + _PAD_TOP + sym2d)) \
            .astype(jnp.bfloat16)                       # (58, 104)
        rows_parts.append(
            jnp.dot(prow, plane, preferred_element_type=jnp.float32)
            .astype(jnp.bfloat16))
        want_parts.extend(f + v for v in gray)
    rows = jnp.concatenate(rows_parts, axis=0)          # (G*58, 256)
    want = jnp.stack(want_parts)                        # (G*8,)
    col = jax.lax.broadcasted_iota(jnp.int32, (NUM_BIN, _G * 8), 0)
    sel = (col == want[None, :]).astype(jnp.bfloat16)   # (256, G*8)
    d = jnp.dot(rows, sel, preferred_element_type=jnp.float32)
    for g in range(_G):
        out_ref[g] = d[g * FT8_ND:(g + 1) * FT8_ND, g * 8:(g + 1) * 8]


def tone_mags_flat_pallas(wf: jax.Array, cand_flat: dict,
                          chan_idx: jax.Array):
    """Drop-in ops/llr._tone_mags_flat: (s2 (N, 58, 8) f32, valid (N, 58))."""
    from .llr import _DATA_SYM, _tone_mags_flat_xla

    B = wf.shape[0]
    if B * 4 * _ROWS * NUM_BIN > _VMEM_LIMIT_BYTES:
        return _tone_mags_flat_xla(wf, cand_flat, chan_idx)

    ts, fs = cand_flat["time_sub"], cand_flat["freq_sub"]
    to, fo = cand_flat["time_offset"], cand_flat["freq_offset"]
    N = ts.shape[0]

    sym = jnp.asarray(_DATA_SYM)
    blocks = to[:, None] + sym[None, :]                  # (N, 58)
    valid = (blocks >= 0) & (blocks < NUM_BLOCKS)

    # (B, 92, 2, 2, 256) -> (B*4, 104, 256) zero-padded (ts, fs) planes
    wfp = jnp.moveaxis(wf.reshape(B, NUM_BLOCKS, 4, NUM_BIN), 2, 1)
    wfp = wfp.reshape(B * 4, NUM_BLOCKS, NUM_BIN)
    wfp = jnp.pad(wfp, ((0, 0), (_PAD_TOP, _PAD_BOT), (0, 0)))

    plane = (chan_idx * 4 + ts * 2 + fs).astype(jnp.int32)
    to_c = jnp.clip(to, -12, 23).astype(jnp.int32)
    fo_c = jnp.clip(fo, 0, NUM_BIN - 8).astype(jnp.int32)

    n_pad = (-N) % _G
    if n_pad:
        plane = jnp.concatenate([plane, jnp.zeros(n_pad, jnp.int32)])
        to_c = jnp.concatenate([to_c, jnp.zeros(n_pad, jnp.int32)])
        fo_c = jnp.concatenate([fo_c, jnp.zeros(n_pad, jnp.int32)])
    n_tot = N + n_pad

    interpret = jax.devices()[0].platform == "cpu"
    if interpret:
        specs = [pl.BlockSpec()] * 4
    else:
        from jax.experimental.pallas import tpu as pltpu
        specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 3 \
            + [pl.BlockSpec(memory_space=pltpu.VMEM)]

    s2 = pl.pallas_call(
        _kernel,
        grid=(n_tot // _G,),
        in_specs=specs,
        out_specs=pl.BlockSpec((_G, FT8_ND, 8), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_tot, FT8_ND, 8), jnp.float32),
        interpret=interpret,
    )(plane, to_c, fo_c, wfp)

    return s2[:N], valid
