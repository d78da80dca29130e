"""Quick hardware smoke: decode the golden fixtures on the live backend.

Asserts the exact checked-in decode lists (tests/fixtures/*, native-
encoded) on whatever jax backend is configured — the fastest way to
confirm a TPU/relay session is healthy and the decode stack is intact
end-to-end. Runs in ~2 min warm (one B=1 compile cold).

Usage: python3 scripts/tpu_smoke.py
"""

import sys
sys.path.insert(0, "/root/repo")



def main():
    try:
        from rtlsdr_ft8d_tpu.host.cache import enable_compilation_cache
        enable_compilation_cache()
    except Exception:
        pass
    import jax

    from rtlsdr_ft8d_tpu.host.io import read_iq
    from rtlsdr_ft8d_tpu.pipeline import decode_window

    print("backend:", jax.devices())
    for name, kw in (("golden_10sig", dict(osd_cands=8, passes=2)),
                     ("golden_busy", dict(osd_cands=8, passes=3))):
        i, q = read_iq(f"/root/repo/tests/fixtures/{name}.iq")
        expected = set()
        for line in open(f"/root/repo/tests/fixtures/{name}.txt"):
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 5 or parts[4] == "1":
                expected.add(parts[0])
        res = decode_window((i, q), **kw)
        texts = {d.text for d in res}
        missing = expected - texts
        extra = texts - {line.split("\t")[0] for line in
                         open(f"/root/repo/tests/fixtures/{name}.txt")}
        status = "OK" if not missing and not extra else "FAIL"
        print(f"{name}: {status} ({len(texts & expected)}/{len(expected)}"
              f" expected; missing={sorted(missing)}, phantoms={sorted(extra)})")
        if status == "FAIL":
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
