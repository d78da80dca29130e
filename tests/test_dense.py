"""Dense-band global-budget decode on the 8-device CPU mesh."""

import numpy as np
import pytest

from rtlsdr_ft8d_tpu.host.synth import synthesize_message
from rtlsdr_ft8d_tpu.parallel.dense import (decode_window_dense,
                                            make_grid_mesh)
from rtlsdr_ft8d_tpu.pipeline import decode_window
from rtlsdr_ft8d_tpu.protocol.encode import bytes_to_bits
from rtlsdr_ft8d_tpu.protocol.unpack import unpack77


def _decode_texts(out, b):
    texts = set()
    ok_idx = np.nonzero(np.asarray(out["ok"])[b])[0]
    packed = np.asarray(out["packed"])
    for k in ok_idx:
        bits = np.unpackbits(packed[b, k])
        texts.add(unpack77(bits[:77]))
    return texts


def test_dense_decode_2d_mesh():
    mesh = make_grid_mesh(2, 4)
    msgs = ["CQ K1JT FN20", "K1ABC W9XYZ EN37"]
    chans = [synthesize_message(msgs[b % 2], f0_hz=250 + 60 * b,
                                noise_sigma=0.1,
                                rng=np.random.default_rng(b))
             for b in range(16)]
    batch = np.stack(chans)
    i_s = np.real(batch).astype(np.float32)
    q_s = np.imag(batch).astype(np.float32)
    out = decode_window_dense(i_s, q_s, mesh, global_budget=400)
    for b in range(16):
        assert msgs[b % 2] in _decode_texts(out, b), b
    # budget respected: selected count <= budget
    assert int(np.asarray(out["n_selected"]).sum()) <= 400
    # pod-scale contract: outputs are the COMPACTED survivor form (12-byte
    # packed payloads, <= 50/channel), never full (B, K, 91) tensors
    assert np.asarray(out["packed"]).shape[1:] == (50, 12)
    assert "hard" not in out


def test_dense_budget_prioritizes_strong_signals():
    """With a tiny global budget, the strong channel wins over the weak."""
    mesh = make_grid_mesh(2, 4)
    strong = synthesize_message("CQ K1JT FN20", f0_hz=400, noise_sigma=0.05,
                                rng=np.random.default_rng(0))
    chans = [strong if b == 3 else
             (0.001 * np.random.default_rng(b).standard_normal(48000)
              + 1j * 0.001 * np.random.default_rng(b + 99)
              .standard_normal(48000)).astype(np.complex64)
             for b in range(8)]
    batch = np.stack(chans)
    out = decode_window_dense(np.real(batch).astype(np.float32),
                              np.imag(batch).astype(np.float32),
                              mesh, global_budget=8)
    assert "CQ K1JT FN20" in _decode_texts(out, 3)
    sel = np.asarray(out["n_selected"])
    # nearly all selections concentrate on the strong channel
    assert sel[3] >= sel.sum() * 0.5
