"""Decoder self-test: encode -> modulate -> decode loopback.

Reproduces the reference's `-t` mode (/root/reference/rtlsdr_ft8d.c:913-972)
— pack "CQ K1JT FN20QI", encode to 79 tones, synthesize at f0=50 Hz with
noise, write selftest.iq, decode, verify — but with a CORRECT pass condition
(the reference's `strcmp(call) && strcmp(loc)` passes when either field
matches, SURVEY.md §8; here both the call and locator must match).
"""

import numpy as np

from .io import write_iq
from .synth import synthesize_message
from ..pipeline import decode_window


def run_selftest(write_file: bool = True, verbose: bool = True) -> bool:
    iq = synthesize_message("CQ K1JT FN20QI", f0_hz=50.0, amplitude=0.5,
                            noise_sigma=0.02, rng=np.random.default_rng(1))
    i_s = np.real(iq).astype(np.float32)
    q_s = np.imag(iq).astype(np.float32)
    if write_file:
        write_iq("selftest.iq", i_s, q_s)
    decodes = decode_window((i_s, q_s))
    if verbose:
        for d in decodes:
            print(f"  score={d.score} freq={d.freq_hz:.1f}Hz "
                  f"dt={d.time_sec:+.2f}s  {d.text}")
    ok = any(d.call == "K1JT" and d.loc == "FN20" for d in decodes)
    if verbose:
        print("Self-test PASSED" if ok else "Self-test FAILED")
    return ok
