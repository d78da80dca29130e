"""Fused waterfall as one Pallas TPU kernel (opt-in, FT8_TPU_WF_PALLAS=1).

Fuses the whole waterfall stage — overlapped frame assembly, the 3-mult
Karatsuba DFT GEMMs, |X|^2, dB log and the bit-exact uint8 quantization —
into a single VMEM-resident kernel per channel. HBM traffic per channel
drops to the 48 k samples in, one 187 KB f32 block-matrix copy per
component (the [:, :used].reshape((-1, 187, 256)) staging below — XLA
materializes it because Mosaic block tiling needs the contiguous
(187, 256) layout), and the 94 KB quantized waterfall out; the XLA path
additionally materializes the 753 KB frame tensors and the 377 KB float
magnitudes in between.

Two Pallas-specific design points:
  * NO frame tensor is built: frame t = blocks t..t+3 of a (187, 256)
    reshape, so each DFT GEMM is the sum over 4 SUBLANE-SHIFTED views of
    the block matrix times the matching 256-row segment of the basis —
    static slices, no concat, no gather (same trick as ops/waterfall.py's
    _frames, pushed one level further).
  * bf16x3 is done EXPLICITLY (hi/lo split, 3 MXU passes per product) so
    the kernel reproduces the measured HIGH precision of the XLA default
    rather than whatever single-pass precision Mosaic would pick.

Layout/quantization match ops/waterfall.py (rtlsdr_ft8d.c:1401-1435
semantics): (..., 92, 2, 2, 256) uint8, q = clip(trunc(2*db+240)).
"""

import functools

import jax
import jax.numpy as jnp


from ..protocol.constants import (FREQ_OSR, NFFT, NUM_BIN, NUM_BLOCKS,
                                  SUB_BLOCK_SIZE, TIME_OSR)
from .waterfall import (_COS, _COS_MINUS_SIN, _SIN, NUM_BLOCKS_RAW,
                        NUM_FRAMES, NUM_SEGMENTS)

_NBINS = NUM_BIN * FREQ_OSR          # 512
_POW_SCALE = 4.0 / (NFFT * NFFT)


def _split(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(x_hi, x_lo, m_hi, m_lo):
    """bf16x3 product of the f32 values behind (x_hi,x_lo)@(m_hi,m_lo)."""
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    return dot(x_hi, m_hi) + dot(x_hi, m_lo) + dot(x_lo, m_hi)


def _wf_kernel(i_ref, q_ref, c_ref, s_ref, cms_ref, out_ref):
    # blocks arrive pre-shaped (1, 187, 256): Mosaic requires the last two
    # block dims to be (mult-of-8, mult-of-128) or the full array dims, so
    # the (B, 48000) -> (B, 187, 256) slice+reshape happens XLA-side
    bl_i = i_ref[0, :, :]
    bl_q = q_ref[0, :, :]
    bl_s = bl_i + bl_q
    i_hi, i_lo = _split(bl_i)
    q_hi, q_lo = _split(bl_q)
    s_hi, s_lo = _split(bl_s)

    p1 = jnp.zeros((NUM_FRAMES, _NBINS), jnp.float32)
    p2 = jnp.zeros((NUM_FRAMES, _NBINS), jnp.float32)
    p3 = jnp.zeros((NUM_FRAMES, _NBINS), jnp.float32)
    for j in range(NUM_SEGMENTS):                    # static unroll, 4
        r0 = j * SUB_BLOCK_SIZE
        c_hi, c_lo = _split(c_ref[r0:r0 + SUB_BLOCK_SIZE, :])
        s_mhi, s_mlo = _split(s_ref[r0:r0 + SUB_BLOCK_SIZE, :])
        m_hi, m_lo = _split(cms_ref[r0:r0 + SUB_BLOCK_SIZE, :])
        sl = slice(j, j + NUM_FRAMES)
        p1 = p1 + _dot3(i_hi[sl], i_lo[sl], c_hi, c_lo)
        p2 = p2 + _dot3(q_hi[sl], q_lo[sl], s_mhi, s_mlo)
        p3 = p3 + _dot3(s_hi[sl], s_lo[sl], m_hi, m_lo)

    re = p1 + p2
    im = p3 - p1 + p2
    mag2 = re * re + im * im
    # EXACTLY the XLA quantize sequence (ops/waterfall.py): db then
    # trunc(2*db + 240) — not an algebraically-merged constant, so the
    # only divergence source vs the default is GEMM rounding
    db = 10.0 * jnp.log10(1e-12 + mag2 * _POW_SCALE)
    q = jnp.clip(jnp.trunc(2.0 * db + 240.0), 0.0, 255.0)
    # Mosaic has no f32->uint8 cast; the value is an exact integer in
    # [0,255] so f32->int32->uint8 is lossless
    out_ref[0, :, :] = q.astype(jnp.int32).astype(jnp.uint8)


@jax.jit
def waterfall_pallas(i_samples: jax.Array, q_samples: jax.Array):
    """Drop-in ops/waterfall.waterfall: (..., 48000) -> uint8 waterfall."""
    from jax.experimental import pallas as pl

    interpret = jax.devices()[0].platform == "cpu"
    batch_shape = i_samples.shape[:-1]
    used = NUM_BLOCKS_RAW * SUB_BLOCK_SIZE           # 47872
    i2 = i_samples.reshape((-1, i_samples.shape[-1]))[:, :used] \
        .reshape((-1, NUM_BLOCKS_RAW, SUB_BLOCK_SIZE)).astype(jnp.float32)
    q2 = q_samples.reshape((-1, q_samples.shape[-1]))[:, :used] \
        .reshape((-1, NUM_BLOCKS_RAW, SUB_BLOCK_SIZE)).astype(jnp.float32)
    B = i2.shape[0]

    mats = (jnp.asarray(_COS), jnp.asarray(_SIN),
            jnp.asarray(_COS_MINUS_SIN))
    fixed = lambda b: (0, 0)
    raw = pl.pallas_call(
        _wf_kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, NUM_BLOCKS_RAW, SUB_BLOCK_SIZE),
                               lambda b: (b, 0, 0)),
                  pl.BlockSpec((1, NUM_BLOCKS_RAW, SUB_BLOCK_SIZE),
                               lambda b: (b, 0, 0))]
        + [pl.BlockSpec(m.shape, fixed) for m in mats],
        out_specs=pl.BlockSpec((1, NUM_FRAMES, _NBINS),
                               lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, NUM_FRAMES, _NBINS), jnp.uint8),
        interpret=interpret,
    )(i2, q2, *mats)

    # (B, 184, 512) -> [block][time_sub][freq_sub][bin]
    wf = raw.reshape((B, NUM_BLOCKS, TIME_OSR, NUM_BIN, FREQ_OSR))
    wf = jnp.swapaxes(wf, -1, -2)
    return wf.reshape(batch_shape + wf.shape[1:])
