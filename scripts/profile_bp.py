"""A/B the XLA BP loop vs the single-kernel Pallas decoder on hardware.

Times both at the production budget (N=1024) and the unbudgeted size
(N=7680), and cross-checks decode agreement on the measured batch.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax.numpy as jnp

    from rtlsdr_ft8d_tpu.host.cache import enable_compilation_cache
    enable_compilation_cache()
    from rtlsdr_ft8d_tpu.ops.ldpc import bp_decode
    from rtlsdr_ft8d_tpu.ops.ldpc_pallas import bp_decode_pallas
    from rtlsdr_ft8d_tpu.protocol.crc import add_crc
    from rtlsdr_ft8d_tpu.protocol.encode import ldpc_encode

    rng = np.random.default_rng(0)

    def make_llrs(n):
        rows = []
        for t in range(n // 4):
            payload = rng.integers(0, 2, 77).astype(np.uint8)
            cw = ldpc_encode(add_crc(payload)).astype(np.float32)
            scale = [4.0, 1.2, 0.7, 0.5][t % 4]
            rows.append((2.0 * cw - 1.0) * scale
                        + rng.normal(0, 1.0, 174).astype(np.float32))
        for _ in range(n - len(rows)):
            rows.append(rng.normal(0, 2.0, 174).astype(np.float32))
        return jnp.asarray(np.stack(rows) * 2.0)

    def timeit(name, fn, llr):
        out = fn(llr)
        np.asarray(out[1].reshape(-1)[0:1])
        DEPTH, REPS = 64, 5
        ts = []
        for _ in range(REPS):
            t0 = time.time()
            outs = [fn(llr) for _ in range(DEPTH)]
            np.asarray(outs[-1][1].reshape(-1)[0:1])
            ts.append((time.time() - t0) / DEPTH)
        print(f"{name:28s} {float(np.median(ts))*1e3:7.3f} ms")
        return out

    for n in (1024, 7680):
        llr = make_llrs(n)
        print(f"--- N={n}")
        h1, e1 = timeit(f"bp_decode (XLA)", lambda x: bp_decode(x), llr)
        h2, e2 = timeit(f"bp_decode_pallas", lambda x:
                        bp_decode_pallas(x, interpret=False), llr)
        h1, e1, h2, e2 = map(np.asarray, (h1, e1, h2, e2))
        ok = e1 == 0
        print(f"    err agree {(e1 == e2).mean():.4f}  "
              f"success xla/pallas {ok.sum()}/{(e2 == 0).sum()}  "
              f"hard-on-success identical: "
              f"{bool((h1[ok] == h2[ok]).all())}")


if __name__ == "__main__":
    main()
