"""Null + gain measurement for scoring the codeword bank against the
BLOCK-COHERENT LLR flavor.

Three measurements, mirroring the ones that calibrated AP_CW_THRESH /
AP_CW_THRESH_SYNCED for the first two flavors (ops/ap.py):
  1. pure-noise null: max normalized bank correlation of the coherent
     flavor over noise channels (overall and among score>=13 candidates);
  2. wrong-hypothesis-with-signal: real signals whose true message is
     NOT in the bank — max correlation against a bank sharing callsign
     bits;
  3. gain: continuation-message decodes via the bank on the coherent
     flavor that the existing two flavors miss, at -22..-23 dB.

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python3 scripts/bank_coh_null.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp
import numpy as np

from rtlsdr_ft8d_tpu.host.synth import synthesize_message
from rtlsdr_ft8d_tpu.ops.ap import codeword_signs, continuation_texts
from rtlsdr_ft8d_tpu.ops.refine import refine_llrs_flat
from rtlsdr_ft8d_tpu.ops.sync import find_sync
from rtlsdr_ft8d_tpu.ops.waterfall import waterfall

BANK_TEXTS = (continuation_texts("K1ABC", "W9XYZ", grid="EN37")
              + continuation_texts("W9XYZ", "K1ABC"))
BANK = codeword_signs(BANK_TEXTS, h_pad=256)


def _sigma(snr_db, amp=0.5):
    return np.sqrt(amp ** 2 / (2 * 10 ** (snr_db / 10) * (2500 / 3200)))


def _flavors(iq_batch, k_cand=8):
    i_s = np.real(iq_batch).astype(np.float32)
    q_s = np.imag(iq_batch).astype(np.float32)
    peak = np.maximum(np.abs(i_s).max(-1, keepdims=True),
                      np.abs(q_s).max(-1, keepdims=True))
    i_n, q_n = i_s * (0.5 / peak), q_s * (0.5 / peak)
    wf = waterfall(jnp.asarray(i_n), jnp.asarray(q_n))
    cand = find_sync(wf, k_cand)
    B = iq_batch.shape[0]
    flat = {k: cand[k].reshape(-1) for k in
            ("time_sub", "freq_sub", "time_offset", "freq_offset")}
    chan = jnp.repeat(jnp.arange(B, dtype=jnp.int32), k_cand)
    ref, score, tri, coh = refine_llrs_flat(
        jnp.asarray(i_n), jnp.asarray(q_n), flat, chan, return_pair=True)
    return ref, tri, coh, np.asarray(cand["score"]).reshape(-1)


def _corr(llr, bank=None):
    b = BANK if bank is None else bank
    num = np.asarray(llr) @ np.asarray(b).T
    den = np.maximum(np.abs(np.asarray(llr)).sum(-1, keepdims=True), 1e-9)
    return (num / den).max(-1)


def main():
    # --- 1. pure-noise null ---
    rng = np.random.default_rng(2024)
    mx_all, mx_synced, n_tr = 0.0, 0.0, 0
    for rep in range(4):
        noise = (rng.normal(0, 1.0, (64, 48000))
                 + 1j * rng.normal(0, 1.0, (64, 48000))) \
            .astype(np.complex64)
        _ref, _tri, coh, score = _flavors(noise, k_cand=16)
        c = _corr(coh)
        n_tr += c.size * BANK.shape[0]
        mx_all = max(mx_all, float(c.max()))
        sy = c[score >= 13]
        if sy.size:
            mx_synced = max(mx_synced, float(sy.max()))
    print(f"noise null ({n_tr/1e6:.1f}M trials): max {mx_all:.3f}  "
          f"score>=13 max {mx_synced:.3f}", flush=True)

    # --- 2. wrong-hypothesis-with-signal ---
    # real K1ABC<->W9XYZ signals whose seeded text is NOT in the bank
    wrong_msgs = ["K1ABC N0XYZ EN37", "N0XYZ K1ABC FN42",
                  "CQ K1ABC FN42"]
    mx_wrong = 0.0
    for snr in (-10.0, -15.0, -19.0):
        batch = np.stack([
            synthesize_message(wrong_msgs[t % 3], f0_hz=300 + 50 * t,
                               noise_sigma=_sigma(snr),
                               rng=np.random.default_rng(1000 + t))
            for t in range(24)])
        _ref, _tri, coh, score = _flavors(batch, k_cand=4)
        in_bank = set(BANK_TEXTS)
        assert not any(m in in_bank for m in wrong_msgs)
        c = _corr(coh)[score >= 13]
        if c.size:
            mx_wrong = max(mx_wrong, float(c.max()))
    print(f"wrong-hypothesis (signal, not in bank): max {mx_wrong:.3f}",
          flush=True)

    # --- 3. gain on continuation traffic at the bank's depth ---
    from rtlsdr_ft8d_tpu.ops.ap import AP_CW_THRESH_SYNCED
    for snr in (-22.0, -22.5, -23.0):
        hits2 = hits3 = 0
        T = 48
        batch = np.stack([
            synthesize_message("K1ABC W9XYZ RR73",
                               f0_hz=400 + 20 * t + (t % 5) / 5 * 6.25,
                               noise_sigma=_sigma(snr),
                               rng=np.random.default_rng(7000 + t))
            for t in range(T)])
        ref, tri, coh, score = _flavors(batch, k_cand=1)
        ok = score >= 13
        c_ref, c_tri, c_coh = _corr(ref), _corr(tri), _corr(coh)
        th = AP_CW_THRESH_SYNCED
        two = ((c_ref > th) | (c_tri > th)) & ok
        three = two | ((c_coh > th) & ok)
        print(f"SNR {snr:6.1f}: bank(ref,tri) {two.sum():2d}/{T}  "
              f"+coh {three.sum():2d}/{T}", flush=True)


if __name__ == "__main__":
    main()
