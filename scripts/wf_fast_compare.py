"""WF_FAST promotion experiment (VERDICT r2 #9): decode-set equality of
the bf16x3 waterfall vs the HIGHEST-precision default across many seeds
and SNRs on real hardware.

The precision env vars are read at import, so each precision runs in
its own process: this script decodes a fixed set of knife-edge ladders
(several seeds x 64 channels spanning -15..-20 dB with mixed message
forms) and writes the sorted per-channel decode lists to a JSON file;
run it twice with the env flipped and diff the files.

  FT8_TPU_EXACT=1 python3 scripts/wf_fast_compare.py /tmp/wf_exact.json
  python3 scripts/wf_fast_compare.py /tmp/wf_default.json   # HIGH
  FT8_TPU_WF_FAST=1 python3 scripts/wf_fast_compare.py /tmp/wf_fast.json
  python3 scripts/wf_fast_compare.py --diff /tmp/wf_exact.json /tmp/wf_default.json

Round-3 measurements (PERF.md precision ladder): HIGH vs HIGHEST
374=374 decodes, 0/512 channels differ (HIGH promoted to default);
1-pass bf16 loses 3/512 (rejected).
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

SEEDS = 8
B = 64
MSGS = ["CQ K1JT FN20", "K1ABC W9XYZ EN37", "CQ VA2GKA FN35",
        "W9XYZ K1ABC R-09", "CQ TEST K1ABC FN42", "K1ABC W9XYZ RR73"]


def sigma_for_snr(snr_db, amp=0.5):
    return np.sqrt(amp ** 2 / (2 * 10 ** (snr_db / 10) * (2500 / 3200)))


def main():
    if sys.argv[1] == "--diff":
        a = json.load(open(sys.argv[2]))
        b = json.load(open(sys.argv[3]))
        n_chan = n_diff = 0
        total_a = total_b = 0
        for key in sorted(a):
            for ch, (la, lb) in enumerate(zip(a[key], b[key])):
                n_chan += 1
                total_a += len(la)
                total_b += len(lb)
                if la != lb:
                    n_diff += 1
                    print(f"DIFF seed-batch {key} ch {ch}: {la} vs {lb}")
        print(f"{n_chan} channels, {total_a} vs {total_b} decodes, "
              f"{n_diff} channels differ")
        sys.exit(1 if n_diff else 0)

    from rtlsdr_ft8d_tpu.host.cache import enable_compilation_cache
    enable_compilation_cache()
    from rtlsdr_ft8d_tpu.host.synth import synthesize_message
    from rtlsdr_ft8d_tpu.pipeline import decode_window

    out = {}
    for seed in range(SEEDS):
        rng = np.random.default_rng(seed)
        chans = []
        for b in range(B):
            snr = -15.0 - 5.0 * b / (B - 1)            # -15..-20 dB
            chans.append(synthesize_message(
                MSGS[(b + seed) % len(MSGS)],
                f0_hz=250 + (17.0 * b + 31.0 * seed) % 1100,
                noise_sigma=sigma_for_snr(snr),
                rng=np.random.default_rng(seed * 1000 + b)))
        res = decode_window(np.stack(chans), budget=1024)
        out[str(seed)] = [sorted(d.text for d in decs) for decs in res]
    with open(sys.argv[1], "w") as f:
        json.dump(out, f)
    n = sum(len(l) for ls in out.values() for l in ls)
    print(f"wrote {sys.argv[1]}: {SEEDS * B} channels, {n} decodes")


if __name__ == "__main__":
    main()
