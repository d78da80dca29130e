"""A/B the block-coherent LLR flavor against the triple-coherent one.

Measures the flavor shipped as ops/refine.py:_block_coherent_llrs:
derotate every symbol's matched-filter output by the Costas-pair CFO
estimate, anchor the absolute carrier phase on the three Costas blocks
(complex-interpolated across each 29-symbol data run), and score each
data symbol COHERENTLY: Re(z~_k(a) conj(ref_k)). O(58*8) per candidate
vs the triple's 54*512 joint-hypothesis tensor.

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python3 scripts/coherent_ab.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp
import numpy as np

from rtlsdr_ft8d_tpu.host.synth import synthesize_message
from rtlsdr_ft8d_tpu.ops.ldpc import bp_decode, crc_check
from rtlsdr_ft8d_tpu.ops.refine import refine_llrs_flat
from rtlsdr_ft8d_tpu.ops.sync import find_sync
from rtlsdr_ft8d_tpu.ops.waterfall import waterfall
from rtlsdr_ft8d_tpu.protocol.unpack import unpack77

MSG = "K1ABC W9XYZ EN37"


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


def _decode_mask(llrs):
    hard, err = bp_decode(llrs, 20)
    ok = np.asarray((err == 0) & crc_check(hard))
    out = np.zeros(ok.shape[0], bool)
    for t in range(ok.shape[0]):
        if ok[t]:
            try:
                out[t] = unpack77(
                    np.asarray(hard[t][:77]).astype(np.uint8)) == MSG
            except Exception:
                pass
    return out


def main():
    for snr in (-19.5, -20.0, -20.5, -21.0, -21.5):
        rng = np.random.default_rng(1234)
        T = 48
        batch = np.stack([
            synthesize_message(
                MSG,
                f0_hz=500 + (t % 7) * 11.25 + rng.uniform(-0.7, 0.7),
                noise_sigma=_sigma(snr), rng=rng)
            for t in range(T)])
        i_n, q_n, best, chan = _prep(batch)
        noncoh, score, tri, coh = refine_llrs_flat(
            i_n, q_n, best, chan, return_pair=True)
        m_non = _decode_mask(noncoh)
        m_tri = _decode_mask(tri)
        m_coh = _decode_mask(coh)
        m_blend = _decode_mask((tri + coh) * np.sqrt(0.5))
        print(f"SNR {snr:6.1f}: noncoh {m_non.sum():2d}/48  "
              f"tri {m_tri.sum():2d}/48  coh {m_coh.sum():2d}/48  "
              f"blend {m_blend.sum():2d}/48  "
              f"union {(m_tri | m_coh).sum():2d}/48  "
              f"union3 {(m_tri | m_coh | m_blend).sum():2d}/48",
              flush=True)


if __name__ == "__main__":
    main()
