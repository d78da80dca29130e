"""Batched waterfall spectrogram (windowed DFT -> quantized uint8).

TPU-native equivalent of the reference's FFTW loop
(/root/reference/rtlsdr_ft8d.c:1401-1435): 92 symbol blocks x 2 half-symbol
time offsets, 1024-pt complex DFT of sine-windowed IQ, log power in dB,
quantized to uint8 in 0.5 dB steps. The bit-exact quantization matters: the
Costas sync scores and 8-FSK LLRs downstream consume these values, so parity
with the reference decode list requires matching `(int)(2*db + 240)`
truncation exactly.

Design notes (TPU-first):
  * The DFT is computed as four real matmuls against cos/sin bases instead
    of an FFT: (184*B, 1024) @ (1024, 512) lands directly on the MXU, all
    184 frames x B channels batched as one GEMM — for these sizes that IS
    the speed-of-light formulation, and it avoids complex dtypes (the TPU
    compute path is float32 end-to-end, matching the reference's separate
    i/q sample buffers, rtlsdr_ft8d.h:96-97).
  * Only bins 0..511 (0..1600 Hz) are ever used downstream, so the basis is
    (1024, 512), halving FLOPs vs a full FFT.

Layout matches the reference waterfall ([block][time_sub][freq_sub][bin],
rtlsdr_ft8d.c:1446 block_stride = 1024) as a (batch, 92, 2, 2, 256) array.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..protocol.constants import (FREQ_OSR, NFFT, NUM_BIN, NUM_BLOCKS,
                                  SUB_BLOCK_SIZE, TIME_OSR)

NUM_FRAMES = NUM_BLOCKS * TIME_OSR  # 184
NUM_FFT_BINS = NUM_BIN * FREQ_OSR   # 512 (0..1600 Hz)

# Sine window ("hann" in the reference, actually sqrt-Hann: sin(pi*i/N),
# rtlsdr_ft8d.c:331-334).
_WINDOW = np.sin(np.pi * np.arange(NFFT) / NFFT).astype(np.float32)

# Frames overlap 4x with a 256-sample stride: frame t covers samples
# [t*256, t*256+1024). Fetching them as a general gather of NUM_FRAMES*1024
# duplicated indices measured 1.6 ms at B=64 on v5e; reshaping into
# NUM_SEGMENTS 256-sample blocks and concatenating 4 STATIC slices is the
# same tensor bit-for-bit at 0.4 ms (lane-aligned copies, no gather).
NUM_SEGMENTS = NFFT // SUB_BLOCK_SIZE               # 4
NUM_BLOCKS_RAW = NUM_FRAMES + NUM_SEGMENTS - 1      # 187


def _frames(x: jax.Array) -> jax.Array:
    """(..., 48000) samples -> (..., 184, 1024) overlapped windowless frames."""
    bl = x[..., :NUM_BLOCKS_RAW * SUB_BLOCK_SIZE].reshape(
        x.shape[:-1] + (NUM_BLOCKS_RAW, SUB_BLOCK_SIZE))
    return jnp.concatenate(
        [bl[..., j:j + NUM_FRAMES, :] for j in range(NUM_SEGMENTS)], axis=-1)

# DFT bases, window folded in: X_k = sum_n w_n x_n e^{-2pi i nk/N}
#   Re X = I @ C + Q @ S ;  Im X = Q @ C - I @ S
_N, _K = np.meshgrid(np.arange(NFFT), np.arange(NUM_FFT_BINS), indexing="ij")
_ANG = 2.0 * np.pi * _N * _K / NFFT
_COS = (np.cos(_ANG) * _WINDOW[:, None]).astype(np.float32)   # (1024, 512)
_SIN = (np.sin(_ANG) * _WINDOW[:, None]).astype(np.float32)
_COS_MINUS_SIN = _COS - _SIN        # third basis of the 3-mult complex GEMM


# Waterfall DFT GEMM precision ladder (measured on hardware with
# scripts/wf_fast_compare.py, 512 knife-edge channels -15..-20 dB):
#   FT8_TPU_WF_FAST=1 -> DEFAULT (1-pass bf16): +27% whole-pipeline
#     throughput, but 3/512 knife-edge decodes LOST — rejected.
#   default           -> HIGH (bf16x3, ~2^-21 relative error): +10%
#     headline (8,132 vs 7,416 windows/s) with the decode set
#     IDENTICAL to HIGHEST on all 512 knife-edge channels, identical
#     57/64 bench ladder, and exact golden-fixture decode lists on
#     hardware — promoted to default in round 3.
#   FT8_TPU_EXACT=1   -> HIGHEST: bit-exact uint8 quantization parity
#     with the C reference semantics (the strict parity anchor; also
#     switches the LDPC GEMMs to six-pass f32, ops/ldpc.py).
import os as _os

_WF_PRECISION = (jax.lax.Precision.HIGHEST
                 if _os.environ.get("FT8_TPU_EXACT") == "1"
                 else jax.lax.Precision.DEFAULT
                 if _os.environ.get("FT8_TPU_WF_FAST") == "1"
                 else jax.lax.Precision.HIGH)


def _dft_mag2(i_frames, q_frames):
    """|DFT|^2 of windowed frames via real matmuls. (..., 1024) -> (..., 512).

    Default path: 3-multiplication complex GEMM (Karatsuba form of
    (I + iQ) @ (C - iS)): P1 = I@C, P2 = Q@S, P3 = (I+Q)@(C-S);
    re = P1 + P2, im = P3 - P1 + P2 — a 25% MXU-FLOP cut vs the classic
    4-GEMM form. Measured on hardware (scripts/wf_fast_compare.py, 512
    knife-edge channels -15..-20 dB): decode sets IDENTICAL to the
    4-GEMM HIGHEST anchor. FT8_TPU_EXACT=1 keeps the classic 4-GEMM
    HIGHEST form as the bit-exact parity anchor.
    """
    kw = dict(precision=_WF_PRECISION,
              preferred_element_type=jnp.float32)
    C, S = jnp.asarray(_COS), jnp.asarray(_SIN)
    if _WF_PRECISION == jax.lax.Precision.HIGH:
        # Karatsuba only at the measured HIGH default: the HIGHEST anchor
        # keeps the classic form for bit parity, and the (rejected)
        # 1-pass-bf16 WF_FAST rung keeps the form its divergence numbers
        # were measured with.
        p1 = jnp.dot(i_frames, C, **kw)
        p2 = jnp.dot(q_frames, S, **kw)
        p3 = jnp.dot(i_frames + q_frames, jnp.asarray(_COS_MINUS_SIN), **kw)
        re = p1 + p2
        im = p3 - p1 + p2
    else:
        re = jnp.dot(i_frames, C, **kw) + jnp.dot(q_frames, S, **kw)
        im = jnp.dot(q_frames, C, **kw) - jnp.dot(i_frames, S, **kw)
    return re * re + im * im


def waterfall_xla(i_samples: jax.Array, q_samples: jax.Array) -> jax.Array:
    """Compute the quantized waterfall.

    Args:
      i_samples, q_samples: (..., 48000) float32 baseband at 3200 sps.

    Returns:
      (..., NUM_BLOCKS, TIME_OSR, FREQ_OSR, NUM_BIN) uint8 waterfall.
    """
    i_f = _frames(i_samples)                       # (..., 184, 1024)
    q_f = _frames(q_samples)
    mag2 = _dft_mag2(i_f, q_f)                     # (..., 184, 512)
    db = 10.0 * jnp.log10(1e-12 + mag2 * (4.0 / (NFFT * NFFT)))
    scaled = jnp.trunc(2.0 * db + 240.0)
    q = jnp.clip(scaled, 0.0, 255.0).astype(jnp.uint8)
    # split frame axis -> (block, time_sub); fft bin = pos*FREQ_OSR + freq_sub
    shape = q.shape[:-2] + (NUM_BLOCKS, TIME_OSR, NUM_BIN, FREQ_OSR)
    q = q.reshape(shape)
    # -> [block][time_sub][freq_sub][bin]
    return jnp.swapaxes(q, -1, -2)


# FT8_TPU_WF_PALLAS selects the fused single-kernel Pallas waterfall
# (ops/waterfall_pallas.py) — the TPU default since the round-5 hardware
# A/B (ops/knobs.py has the numbers and the resolution order). The knob
# lives HERE so every consumer (single-chip pipeline, sharded dense
# path, tests) resolves the same implementation. FT8_TPU_EXACT=1 wins
# over it: the bit-exact parity anchor must never be silently replaced
# by a bf16x3 kernel.
def waterfall(i_s, q_s):
    from .knobs import pallas_selected
    if pallas_selected("FT8_TPU_WF_PALLAS", exact_wins=True):
        from .waterfall_pallas import waterfall_pallas
        return waterfall_pallas(i_s, q_s)
    return waterfall_xla(i_s, q_s)
