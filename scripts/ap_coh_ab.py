"""Does AP-clamping the BLOCK-COHERENT flavor add decodes?

The deep ladder clamps AP hypothesis bits on the noncoherent and the
triple-coherent LLR flavors (pipeline.deep_rungs). This measures, on
AP-eligible traffic at the threshold, whether running the same clamps
on the block-coherent flavor unions any additional decodes — i.e.
whether a third flavor in the AP loop is worth its extra BP rungs.

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python3 scripts/ap_coh_ab.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp
import numpy as np

from rtlsdr_ft8d_tpu.host.synth import synthesize_message
from rtlsdr_ft8d_tpu.ops.ap import AP_CLAMP_MAG, clamp_row_cq, \
    clamp_row_to_call
from rtlsdr_ft8d_tpu.ops.ldpc import bp_decode, crc_check
from rtlsdr_ft8d_tpu.ops.refine import refine_llrs_flat
from rtlsdr_ft8d_tpu.ops.sync import find_sync
from rtlsdr_ft8d_tpu.ops.waterfall import waterfall
from rtlsdr_ft8d_tpu.protocol.unpack import unpack77

MY_CALL = "VA2GKA"
MSGS = ["CQ W9XYZ EN37", f"{MY_CALL} K1ABC -07"]


def _sigma(snr_db, amp=0.5):
    return np.sqrt(amp ** 2 / (2 * 10 ** (snr_db / 10) * (2500 / 3200)))


def _prep(iq_batch):
    i_s = np.real(iq_batch).astype(np.float32)
    q_s = np.imag(iq_batch).astype(np.float32)
    peak = np.maximum(np.abs(i_s).max(-1, keepdims=True),
                      np.abs(q_s).max(-1, keepdims=True))
    i_n, q_n = i_s * (0.5 / peak), q_s * (0.5 / peak)
    wf = waterfall(jnp.asarray(i_n), jnp.asarray(q_n))
    cand = find_sync(wf, 120)
    best = {k: cand[k][:, 0] for k in
            ("time_sub", "freq_sub", "time_offset", "freq_offset")}
    chan = jnp.arange(iq_batch.shape[0], dtype=jnp.int32)
    return jnp.asarray(i_n), jnp.asarray(q_n), best, chan


def _decode_mask(llrs, seeded):
    hard, err = bp_decode(llrs, 20)
    ok = np.asarray((err == 0) & crc_check(hard))
    out = np.zeros(ok.shape[0], bool)
    for t in range(ok.shape[0]):
        if ok[t]:
            try:
                out[t] = unpack77(
                    np.asarray(hard[t][:77]).astype(np.uint8)) \
                    == seeded[t]
            except Exception:
                pass
    return out


def _clamped(llr, signs):
    mask = signs != 0.0
    clamp = signs * np.float32(AP_CLAMP_MAG)
    return llr.at[..., :77].set(
        jnp.where(jnp.asarray(mask), jnp.asarray(clamp), llr[..., :77]))


def main():
    rows = [("cq", clamp_row_cq()),
            ("mycall", clamp_row_to_call(MY_CALL))]
    for snr in (-21.0, -21.5, -22.0, -22.5):
        rng = np.random.default_rng(4321)
        T = 48
        seeded = [MSGS[t % 2] for t in range(T)]
        batch = np.stack([
            synthesize_message(
                seeded[t],
                f0_hz=500 + (t % 7) * 11.25 + rng.uniform(-0.7, 0.7),
                noise_sigma=_sigma(snr), rng=rng)
            for t in range(T)])
        i_n, q_n, best, chan = _prep(batch)
        noncoh, _score, tri, coh = refine_llrs_flat(
            i_n, q_n, best, chan, return_pair=True)
        base = np.zeros(T, bool)
        for llr in (noncoh, tri, coh):
            base |= _decode_mask(llr, seeded)
        ap2 = base.copy()
        ap3 = base.copy()
        for _name, signs in rows:
            for llr in (tri, noncoh):
                m = _decode_mask(_clamped(llr, signs), seeded)
                ap2 |= m
                ap3 |= m
            ap3 |= _decode_mask(_clamped(coh, signs), seeded)
        print(f"SNR {snr:6.1f}: plain-rungs {base.sum():2d}/48  "
              f"+AP(non,tri) {ap2.sum():2d}/48  "
              f"+AP(coh too) {ap3.sum():2d}/48  "
              f"coh-AP-only {(ap3 & ~ap2).sum()}", flush=True)


if __name__ == "__main__":
    main()
