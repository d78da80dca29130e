"""Decode sensitivity sweep: decode probability vs SNR.

Characterizes the decoder against the FT8 sensitivity expectation (the
WSJT-X/ft8_lib class of simple non-coherent decoders reaches ~50% around
-18..-20 dB SNR in 2500 Hz). Trials at each SNR are batched as channels, so
a full sweep is a handful of decode_window calls.

Usage: [JAX_PLATFORMS=cpu] python3 scripts/sensitivity.py [trials_per_snr]
Writes SENSITIVITY.md at the repo root.
"""

import sys
sys.path.insert(0, "/root/repo")

import numpy as np

from rtlsdr_ft8d_tpu.host.synth import synthesize_message
from rtlsdr_ft8d_tpu.pipeline import decode_window

MESSAGE = "K1ABC W9XYZ EN37"
AMP = 0.5


def sigma_for_snr(snr_db):
    """Complex-noise sigma per component for a given SNR in 2500 Hz."""
    # tone power amp^2; noise power in 2500 Hz = 2 sigma^2 * (2500/3200)
    return np.sqrt(AMP ** 2 / (2 * 10 ** (snr_db / 10) * (2500 / 3200)))


def run(trials=24):
    rows = []
    rng = np.random.default_rng(1234)
    for snr in range(-24, -7, 1):
        sigma = sigma_for_snr(snr)
        chans = []
        for t in range(trials):
            f0 = 300.0 + 12.5 * t
            chans.append(synthesize_message(
                MESSAGE, f0_hz=f0, amplitude=AMP, noise_sigma=sigma,
                rng=rng))
        batch = np.stack(chans)
        res = decode_window(batch)
        n_ok = sum(1 for decs in res if MESSAGE in {d.text for d in decs})
        rows.append((snr, n_ok, trials))
        print(f"SNR {snr:+3d} dB: {n_ok:2d}/{trials} decoded", flush=True)
    return rows


def main():
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    rows = run(trials)
    with open("/root/repo/SENSITIVITY.md", "w") as f:
        f.write("# Decode sensitivity (synthesized AWGN channel)\n\n")
        f.write(f"Message `{MESSAGE}`, amplitude {AMP}, complex AWGN, "
                f"{trials} trials/point,\nSNR referred to 2500 Hz "
                "bandwidth. Produced by scripts/sensitivity.py.\n\n")
        f.write("| SNR (dB) | decoded | rate |\n|---|---|---|\n")
        thresh = None
        for snr, ok, n in rows:
            f.write(f"| {snr:+d} | {ok}/{n} | {ok / n:.2f} |\n")
            if thresh is None and ok >= n / 2:
                thresh = snr
        f.write(f"\n50% threshold ≈ **{thresh} dB** (ft8_lib-class "
                "non-coherent single-pass decoders: −18…−20 dB).\n")
    print("wrote SENSITIVITY.md")


if __name__ == "__main__":
    main()
