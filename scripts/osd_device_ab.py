"""A/B the device OSD graph (ops/osd_jax.py) against the native host
path on hardware, at production n_osd sizes.

Prints per-size timings (host native vs device, and the stacked
two-flavor device call) plus exact accept/message parity. Promotion
rule: FT8_TPU_OSD_DEVICE becomes the documented default only if the
device call (including its launch overhead) beats host native + the
posterior transfer it eliminates, with zero parity divergence.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def _force(x):
    # slice ON DEVICE, then fetch one element (the axon idiom) — a
    # whole-array np.asarray would put a full D2H inside the timed region
    np.asarray(x.ravel()[0:1])


def _timeit(name, fn, *args, reps=5, depth=8):
    out = fn(*args)
    _force(out[1] if isinstance(out, tuple) else out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        outs = [fn(*args) for _ in range(depth)]
        last = outs[-1]
        _force(last[1] if isinstance(last, tuple) else last)
        ts.append((time.time() - t0) / depth)
    med = float(np.median(ts)) * 1e3
    print(f"{name:34s} {med:8.3f} ms", flush=True)
    return out, med


def _posterior_corpus(n, seed=0):
    """Realistic OSD inputs: BP posteriors of noisy codewords that BP
    itself fails on, mixed with pure-noise rows (the device ships both
    kinds), tiled to n rows."""
    import jax.numpy as jnp

    from rtlsdr_ft8d_tpu.ops.ldpc import bp_decode
    from rtlsdr_ft8d_tpu.protocol.crc import payload_crc
    from rtlsdr_ft8d_tpu.protocol.encode import ldpc_encode
    from rtlsdr_ft8d_tpu.protocol.pack import pack77

    rng = np.random.default_rng(seed)
    rows = []
    for text in ("CQ K1JT FN20", "K1ABC W9XYZ EN37", "CQ DX F8ABC JN05"):
        bits91 = np.zeros(91, np.uint8)
        p = pack77(text)
        crc = payload_crc(p)
        bits91[:77] = p
        bits91[77:91] = [(crc >> (13 - i)) & 1 for i in range(14)]
        cw = ldpc_encode(bits91)
        signs = 2.0 * cw.astype(np.float64) - 1.0
        for sigma in (1.5, 1.9, 2.3, 2.8):
            for _ in range(n // 24):
                rows.append(signs * 2.0 + rng.normal(0, sigma, 174))
    while len(rows) < n:
        rows.append(rng.normal(0, 2.0, 174))
    llrs = np.stack(rows[:n]).astype(np.float32)
    _, _, post = bp_decode(jnp.asarray(llrs), 20, return_posterior=True)
    return np.asarray(post, np.float32)


def main():
    import jax
    import jax.numpy as jnp

    from rtlsdr_ft8d_tpu.host.cache import enable_compilation_cache
    enable_compilation_cache()
    from rtlsdr_ft8d_tpu.ops.osd import osd_batch
    from rtlsdr_ft8d_tpu.ops.osd_jax import osd_device, osd_device_both

    print("backend:", jax.devices()[0].platform, flush=True)
    for n in (256, 1024):
        llrs = _posterior_corpus(n)
        (m_h, a_h), t_host = _timeit(
            f"osd host native      n={n}", osd_batch, llrs)
        dev = jnp.asarray(llrs)
        (m_d, a_d), t_dev = _timeit(
            f"osd device           n={n}", osd_device, dev)
        m_d, a_d = np.asarray(m_d), np.asarray(a_d)
        ok = (np.array_equal(a_d, a_h)
              and np.array_equal(m_d[a_h], m_h[a_h]))
        print(f"    accepts host={int(a_h.sum())} device={int(a_d.sum())}"
              f" parity={'EXACT' if ok else 'MISMATCH'}"
              f" speedup={t_host / max(t_dev, 1e-9):.1f}x", flush=True)
        # the production call: both posterior flavors in one stacked run
        _timeit(f"osd device both      n={n}", osd_device_both, dev, dev)
        # host round-trip the device path eliminates (posts down only).
        # jax caches the host copy after the first __array__, so each
        # iteration must fetch a FRESH device array
        fresh = [dev + np.float32(i + 1) for i in range(8)]
        _force(fresh[0])
        t0 = time.time()
        for f in fresh:
            _ = jax.device_get(f)
        print(f"    posterior D2H transfer        "
              f"{(time.time() - t0) / 8 * 1e3:8.3f} ms (x2 flavors)",
              flush=True)


if __name__ == "__main__":
    main()
