"""Polyphase filterbank channelizer: one 2.4 Msps capture -> 750 channels.

The reference monitors ONE 3.2 kHz FT8 sub-band per dongle
(/root/reference/rtlsdr_ft8d.c:1278 tunes a single dial frequency). The
TPU-native scale story is the opposite: keep the WHOLE 2.4 MHz capture and
split it into 750 critically-sampled 3200-sps channels with a polyphase
analysis filterbank, then batch-decode every channel in one graph — this is
how "1000+ concurrent channels" (BASELINE.json config 5) arises from real
hardware rather than 1000 dongles.

Math: with the decimator's 750-phase prototype bank w (ops/decimate.py),
  z[m, p] = sum_r w[r*750+p] * x[(m+r)*750 + p]        (8 taps per phase)
  y[m, k] = sum_p z[m, p] * e^{+2pi i p k / 750}       (DFT across phases)
Channel k is centered at k*3200 Hz (negative half maps to k >= 375); its
output is complex baseband at 3200 sps, directly decodable by the standard
pipeline. The DFT is two real matmuls against (750, 750) cos/sin bases —
MXU work, no FFT, no complex dtypes.

Limitations (documented, standard for critically-sampled PFBs): signals
within the filter transition band of a channel edge straddle two channels;
use the 2x-overlap configuration (channel_offset=0.5) to cover edges.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..protocol.constants import CAPTURE_RATE, SIGNAL_SAMPLE_RATE
from .decimate import HISTORY, PHASES, R, _polyphase_bank, filter_taps

NUM_CHANNELS = R  # 750


@functools.cache
def _dft_bases():
    p, k = np.meshgrid(np.arange(R), np.arange(R), indexing="ij")
    ang = 2.0 * np.pi * p * k / R
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


@jax.jit
def channelize(i_full: jax.Array, q_full: jax.Array):
    """Split a full-rate stream into 750 baseband channels.

    Args:
      i_full, q_full: (n,) float32 at 2.4 Msps with n = HISTORY + 750*M
        (prepend HISTORY zeros or carried state).

    Returns:
      (i_ch, q_ch): (750, M) float32 — channel k at center k*3200 Hz
      (k >= 375 are the negative frequencies), each at 3200 sps.
    """
    bank = jnp.asarray(_polyphase_bank())          # (750, 8), time-reversed
    n = i_full.shape[-1]
    m = (n - HISTORY) // R
    nf = m + PHASES - 1

    def phase_filter(x):
        fr = x.reshape(nf, R)                      # (m+7, 750) frames
        z = jnp.zeros((m, R), jnp.float32)
        for r in range(PHASES):
            z = z + fr[r:r + m, :] * bank[:, r][None, :]
        return z

    zi = phase_filter(i_full)
    zq = phase_filter(q_full)
    cos, sin = map(jnp.asarray, _dft_bases())
    kw = dict(precision=jax.lax.Precision.HIGHEST,
              preferred_element_type=jnp.float32)
    # channel k = down-shift by k*3200 Hz: (zi + j zq) · e^{-j ang}
    re = jnp.dot(zi, cos, **kw) + jnp.dot(zq, sin, **kw)
    im = jnp.dot(zq, cos, **kw) - jnp.dot(zi, sin, **kw)
    return re.T, im.T                              # (750, M)


class StreamingChannelizer:
    """Overlap-save streaming wrapper (same state carry as the decimator)."""

    def __init__(self):
        self._hist_i = np.zeros(HISTORY, np.float32)
        self._hist_q = np.zeros(HISTORY, np.float32)

    def process(self, i_chunk, q_chunk):
        i_chunk = np.asarray(i_chunk, np.float32)
        q_chunk = np.asarray(q_chunk, np.float32)
        assert i_chunk.shape[-1] % R == 0
        i_full = np.concatenate([self._hist_i, i_chunk])
        q_full = np.concatenate([self._hist_q, q_chunk])
        self._hist_i = i_full[-HISTORY:].copy()
        self._hist_q = q_full[-HISTORY:].copy()
        i_ch, q_ch = channelize(jnp.asarray(i_full), jnp.asarray(q_full))
        return np.asarray(i_ch), np.asarray(q_ch)


def channel_center_hz(k: int) -> float:
    """Center frequency of channel k relative to the capture center."""
    f = k * float(SIGNAL_SAMPLE_RATE)
    if f >= CAPTURE_RATE / 2:
        f -= CAPTURE_RATE
    return f
