"""Randomized end-to-end stress: many channels, many signals, multipass."""

import numpy as np
import pytest

from rtlsdr_ft8d_tpu.host.synth import synthesize_message
from rtlsdr_ft8d_tpu.pipeline import decode_window

CALLS = ["K1ABC", "W9XYZ", "VA2GKA", "N0XYZ", "G4ABC", "JA1ABC", "VK2DEF",
         "PY2GHI"]
GRIDS = ["FN20", "EN37", "FN35", "DM79", "IO91", "PM95", "QF56", "GG66"]


def _random_message(rng):
    kind = rng.integers(0, 4)
    a = CALLS[rng.integers(0, len(CALLS))]
    b = CALLS[rng.integers(0, len(CALLS))]
    g = GRIDS[rng.integers(0, len(GRIDS))]
    if kind == 0:
        return f"CQ {a} {g}"
    if kind == 1:
        return f"{a} {b} {g}"
    if kind == 2:
        return f"{a} {b} R-{rng.integers(1, 25):02d}"
    return f"{a} {b} RR73"


def test_many_channels_many_signals():
    """16 channels x 3 well-separated signals each, moderate noise."""
    rng = np.random.default_rng(42)
    expected = []
    chans = []
    for b in range(16):
        iq = np.zeros(48000, np.complex64)
        msgs = set()
        while len(msgs) < 3:
            msgs.add(_random_message(rng))
        msgs = sorted(msgs)
        for k, m in enumerate(msgs):
            f0 = 200.0 + 400.0 * k + float(rng.integers(0, 50)) * 6.25
            iq += synthesize_message(m, f0_hz=f0, amplitude=0.3,
                                     noise_sigma=0.0,
                                     start_sample=int(rng.integers(0, 1280)))
        iq += 0.02 * (rng.standard_normal(48000)
                      + 1j * rng.standard_normal(48000)).astype(np.complex64)
        chans.append(iq)
        expected.append(msgs)
    res = decode_window(np.stack(chans))
    found = 0
    total = 0
    for b, msgs in enumerate(expected):
        got = {d.text for d in res[b]}
        for m in msgs:
            total += 1
            found += m in got
    # all well-separated signals must decode
    assert found == total, f"{found}/{total}"


def test_crowded_channel_multipass_gains():
    """12 signals crammed into 800 Hz; pass 2 must add decodes."""
    rng = np.random.default_rng(7)
    msgs = []
    while len(msgs) < 12:
        m = _random_message(rng)
        if m not in msgs:
            msgs.append(m)
    iq = np.zeros(48000, np.complex64)
    for k, m in enumerate(msgs):
        f0 = 300.0 + k * 62.5 + float(rng.integers(0, 3)) * 6.25
        amp = 0.5 * 10 ** (-rng.uniform(0, 1.2))     # 0..-24 dB spread
        iq += synthesize_message(m, f0_hz=f0, amplitude=amp,
                                 noise_sigma=0.0,
                                 start_sample=int(rng.integers(0, 640)))
    iq += 0.01 * (rng.standard_normal(48000)
                  + 1j * rng.standard_normal(48000)).astype(np.complex64)
    one = {d.text for d in decode_window(iq, passes=1)} & set(msgs)
    three = {d.text for d in decode_window(iq, passes=3)} & set(msgs)
    assert len(one) >= 6                      # crowded but most decode
    assert len(three) >= len(one)             # subtraction never loses
    assert len(three) >= 10, (len(one), len(three))
