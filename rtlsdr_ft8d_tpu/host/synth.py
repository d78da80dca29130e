"""FT8 signal synthesis for self-test and test vectors.

Mirrors the reference self-test modulator (/root/reference/rtlsdr_ft8d.c:
937-955): phase-continuous complex FSK, 512 samples/symbol at 3200 sps,
tone frequency f0 + (tone - 3.5) * 6.25 Hz, plus white Gaussian noise.
"""

import numpy as np

from ..protocol.constants import (BLOCK_SIZE, SIGNAL_LENGTH_S,
                                  SIGNAL_SAMPLE_RATE, TONE_SPACING_HZ)
from ..protocol.encode import encode
from ..protocol.pack import pack77

WINDOW_SAMPLES = SIGNAL_LENGTH_S * SIGNAL_SAMPLE_RATE  # 48000


def synthesize_tones(tones, f0_hz=50.0, start_sample=0, amplitude=0.5,
                     noise_sigma=0.0, rng=None, num_samples=WINDOW_SAMPLES):
    """Render a 79-tone FT8 burst into a complex64 window."""
    rng = rng or np.random.default_rng(0)
    out = np.zeros(num_samples, dtype=np.complex128)
    dt = 1.0 / SIGNAL_SAMPLE_RATE
    phi = 0.0
    idx = start_sample
    for tone in tones:
        f = f0_hz + (float(tone) - 3.5) * TONE_SPACING_HZ
        dphi = 2.0 * np.pi * dt * f
        n = np.arange(BLOCK_SIZE)
        seg = amplitude * np.exp(1j * (phi + dphi * n))
        # clip BOTH window edges: a negative idx (negative-dt burst) must
        # drop leading samples, not wrap to the window's tail via Python
        # negative indexing
        end = min(idx + BLOCK_SIZE, num_samples)
        s0 = max(idx, 0)
        if s0 < end:
            out[s0:end] += seg[s0 - idx:end - idx]
        phi += dphi * BLOCK_SIZE
        idx += BLOCK_SIZE
    if noise_sigma > 0:
        out += noise_sigma * (rng.standard_normal(num_samples)
                              + 1j * rng.standard_normal(num_samples))
    return out.astype(np.complex64)


def synthesize_message(text, f0_hz=50.0, start_sample=0, amplitude=0.5,
                       noise_sigma=0.0, rng=None):
    """Pack + encode + modulate a message text into one 15-s window."""
    return synthesize_tones(encode(pack77(text)), f0_hz=f0_hz,
                            start_sample=start_sample, amplitude=amplitude,
                            noise_sigma=noise_sigma, rng=rng)
