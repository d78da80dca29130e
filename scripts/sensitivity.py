"""Decode sensitivity sweep: decode probability vs SNR, per decoder variant.

Characterizes the decoder against the FT8 sensitivity expectation (the
WSJT-X/ft8_lib class of simple non-coherent decoders reaches ~50% around
-18..-20 dB SNR in 2500 Hz; WSJT-X with a-priori + OSD reaches ~-21 dB).
Trials at each SNR are batched as channels, so a full sweep is a handful
of decode_window calls per variant.

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

VARIANTS = [
    ("single-pass BP", {}),
    ("+OSD", {"osd_cands": 8}),
    ("+OSD+AP", {"osd_cands": 8, "ap_cq": True}),
]

SNRS = [s / 2.0 for s in range(-44, -15)]   # -22.0 .. -8.0 in 0.5 dB


def sigma_for_snr(snr_db):
    """Complex-noise sigma per component for a given SNR in 2500 Hz."""
    # tone power amp^2; noise power in 2500 Hz = 2 sigma^2 * (2500/3200)
    return np.sqrt(AMP ** 2 / (2 * 10 ** (snr_db / 10) * (2500 / 3200)))


def run(trials=100):
    rows = []
    for snr in SNRS:
        sigma = sigma_for_snr(snr)
        chans = []
        for t in range(trials):
            f0 = 250.0 + 1050.0 * t / trials
            chans.append(synthesize_message(
                MESSAGE, f0_hz=f0, amplitude=AMP, noise_sigma=sigma,
                rng=np.random.default_rng(hash((snr, t)) % (1 << 31))))
        batch = np.stack(chans)
        counts = []
        for _name, kw in VARIANTS:
            res = decode_window(batch, **kw)
            counts.append(sum(1 for decs in res
                              if MESSAGE in {d.text for d in decs}))
        rows.append((snr, counts, trials))
        print(f"SNR {snr:+6.1f} dB: "
              + "  ".join(f"{n}:{c:3d}/{trials}"
                          for (n, _), c in zip(VARIANTS, counts)),
              flush=True)
        if all(c == trials for c in counts):
            break
    return rows


def threshold_50(rows, vi):
    """Interpolated SNR where the decode rate crosses 50%."""
    prev = None
    for snr, counts, n in rows:
        rate = counts[vi] / n
        if rate >= 0.5:
            if prev is None:
                return snr
            psnr, prate = prev
            if rate == prate:
                return snr
            return psnr + (0.5 - prate) * (snr - psnr) / (rate - prate)
        prev = (snr, counts[vi] / n)
    return None


def main():
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    rows = run(trials)
    with open("/root/repo/SENSITIVITY.md", "w") as f:
        f.write("# Decode sensitivity (synthesized AWGN channel)\n\n")
        f.write(f"Message `{MESSAGE}`, amplitude {AMP}, complex AWGN, "
                f"{trials} trials/point,\nSNR referred to 2500 Hz "
                "bandwidth. Produced by scripts/sensitivity.py.\n\n")
        f.write("| SNR (dB) | " + " | ".join(n for n, _ in VARIANTS)
                + " |\n")
        f.write("|---|" + "---|" * len(VARIANTS) + "\n")
        for snr, counts, n in rows:
            f.write(f"| {snr:+.1f} | "
                    + " | ".join(f"{c}/{n}" for c in counts) + " |\n")
        f.write("\n50% thresholds: "
                + ", ".join(
                    f"{name} ≈ **{threshold_50(rows, vi):.1f} dB**"
                    for vi, (name, _) in enumerate(VARIANTS)
                    if threshold_50(rows, vi) is not None)
                + ".\n\nReference class (ft8_lib/WSJT-X single-pass "
                "non-coherent): −18…−20 dB; WSJT-X with AP+OSD: ~−21 dB.\n")
    print("wrote SENSITIVITY.md")


if __name__ == "__main__":
    main()
