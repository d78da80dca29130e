"""Whole-graph Pallas-knob integration: decode lists must match XLA.

The per-kernel tests pin each Pallas kernel to its XLA formulation; this
one runs the FULL budgeted decode graph with ALL four knobs on (env is
read at import => subprocess, interpret mode on CPU) against the same
fixture decoded by the default graph. The waterfall kernel is bf16x3
(not bit-exact), so this is exactly the decode-list instrument the
promotion decision uses, in miniature.
"""

import os
import subprocess
import sys

_CODE = r"""
import numpy as np
from rtlsdr_ft8d_tpu.host.synth import synthesize_message
from rtlsdr_ft8d_tpu.pipeline import decode_window

msgs = ["CQ K1JT FN20", "K1ABC W9XYZ EN37",
        "CQ VA2GKA FN35", "W9XYZ K1ABC R-09"]
rng = np.random.default_rng(42)
batch = np.stack([synthesize_message(msgs[b % 4], f0_hz=150 + 210 * b,
                                     noise_sigma=0.3, rng=rng)
                  for b in range(4)])
res = decode_window(batch, budget=64)
for b, decs in enumerate(res):
    for d in sorted({x.text for x in decs}):
        print(f"{b}\t{d}")
"""


def _decode_texts(extra_env):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
               **extra_env)
    out = subprocess.run([sys.executable, "-c", _CODE], env=env,
                         capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    return out.stdout.strip().splitlines()


def test_all_pallas_knobs_match_xla_decode_lists():
    base = _decode_texts({})
    assert len(base) >= 4                      # every channel decoded
    knobs = _decode_texts({"FT8_TPU_BP_PALLAS": "1",
                           "FT8_TPU_WF_PALLAS": "1",
                           "FT8_TPU_SYNC_PALLAS": "1",
                           "FT8_TPU_LLR_PALLAS": "1"})
    assert knobs == base
