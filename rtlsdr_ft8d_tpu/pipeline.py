"""End-to-end FT8 window decode: the TPU-native `ft8_subsystem`.

The reference's per-window pipeline (/root/reference/rtlsdr_ft8d.c:1387-1524)
— waterfall STFT -> Costas sync search -> per-candidate LLR + LDPC + CRC ->
dedup -> spot extraction — rebuilt as ONE jitted batched graph over a
channels axis, with only unpack/dedup on the host (a few survivors per
window). Stages:

  decode_window_device (jit): (B, 48000) complex -> per-candidate hard bits,
    LDPC residual errors, CRC flags, candidate metadata.
  decode_window (host): runs the device graph, unpacks/dedups survivors and
    returns per-channel Decode lists.
"""

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .ops.ldpc import bp_decode, crc_check
from .ops.llr import extract_llrs
from .ops.sync import find_sync
from .ops.waterfall import waterfall
from .protocol.constants import (FT8_LDPC_K, K_LDPC_ITERS, K_MAX_CANDIDATES,
                                 K_MIN_SCORE, TONE_SPACING_HZ)
from .protocol.text import CallsignHashTable
from .protocol.unpack import UnpackError, unpack77


@dataclass
class Decode:
    """One decoded message (reference `decoder_results` + full text)."""
    text: str
    freq_hz: float
    time_sec: float
    score: int
    snr_db: float = 0.0

    @property
    def is_cq(self) -> bool:
        return self.text.startswith("CQ")

    @property
    def call(self) -> str:
        parts = self.text.split()
        if self.is_cq:
            # 'CQ CALL GRID' or directed 'CQ DX|nnn|AAAA CALL GRID'
            idx = 1
            if len(parts) > 3 and (parts[1] == "DX" or parts[1].isdigit()
                                   or (parts[1].isalpha()
                                       and len(parts[1]) <= 4)):
                idx = 2
            return parts[idx] if len(parts) > idx else ""
        return parts[0] if parts else ""

    @property
    def loc(self) -> str:
        if not self.is_cq:
            return ""
        parts = self.text.split()
        return parts[-1] if len(parts) >= 3 and len(parts[-1]) == 4 else ""


@functools.partial(jax.jit, static_argnames=("num_candidates", "ldpc_iters"))
def decode_window_device(iq: jax.Array,
                         num_candidates: int = K_MAX_CANDIDATES,
                         ldpc_iters: int = K_LDPC_ITERS):
    """Device-side decode graph.

    Args:
      iq: (B, 48000) complex64 baseband channels at 3200 sps.

    Returns dict with (B, K) candidate metadata and per-candidate results:
      hard (B, K, 91) int8, ldpc_errors (B, K) int32, crc_ok (B, K) bool.
    """
    wf = waterfall(iq)
    cand = find_sync(wf, num_candidates)
    llrs = extract_llrs(wf, cand)
    hard, errors = bp_decode(llrs, ldpc_iters)
    ok = (errors == 0) & crc_check(hard) & (cand["score"] >= K_MIN_SCORE)
    return {
        "hard": hard[..., :FT8_LDPC_K],
        "ldpc_errors": errors,
        "crc_ok": ok,
        "score": cand["score"],
        "time_sub": cand["time_sub"],
        "freq_sub": cand["freq_sub"],
        "time_offset": cand["time_offset"],
        "freq_offset": cand["freq_offset"],
    }


def decode_window(iq, hashes: CallsignHashTable | None = None,
                  num_candidates: int = K_MAX_CANDIDATES,
                  ldpc_iters: int = K_LDPC_ITERS):
    """Decode a batch of channels; returns list (per channel) of Decode lists.

    `iq` may be (48000,) or (B, 48000), complex or (i, q) float pair.
    """
    iq = jnp.asarray(iq)
    if iq.ndim == 1:
        iq = iq[None]
        squeeze = True
    else:
        squeeze = False
    out = jax.device_get(decode_window_device(iq, num_candidates, ldpc_iters))

    results = []
    for b in range(iq.shape[0]):
        seen = {}
        decodes = []
        ok_idx = np.nonzero(out["crc_ok"][b])[0]
        for k in ok_idx:
            bits = out["hard"][b, k]
            try:
                text = unpack77(bits[:77], hashes)
            except UnpackError:
                continue
            if text in seen:
                continue
            seen[text] = True
            freq_hz = (out["freq_offset"][b, k]
                       + out["freq_sub"][b, k] / 2.0) * TONE_SPACING_HZ
            time_sec = (out["time_offset"][b, k]
                        + out["time_sub"][b, k] / 2.0) * 0.16
            decodes.append(Decode(text=text, freq_hz=float(freq_hz),
                                  time_sec=float(time_sec),
                                  score=int(out["score"][b, k])))
        results.append(decodes)
    return results[0] if squeeze else results
