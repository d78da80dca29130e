"""A/B every Pallas kernel against its XLA formulation on hardware.

Times waterfall, sync scoring and BP (N=1024 and N=7680) in both forms
and cross-checks agreement on the measured batch. Run after any kernel
change; promote a Pallas kernel to default only with the full
instrument set (bench gates + knife-edge + golden fixtures).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def timeit(name, fn, *args, probe=None):
    import numpy as np
    out = fn(*args)
    p = probe(out) if probe else out
    np.asarray(p.reshape(-1)[0:1])
    DEPTH, REPS = 64, 5
    ts = []
    for _ in range(REPS):
        t0 = time.time()
        outs = [fn(*args) for _ in range(DEPTH)]
        p = probe(outs[-1]) if probe else outs[-1]
        np.asarray(p.reshape(-1)[0:1])
        ts.append((time.time() - t0) / DEPTH)
    print(f"{name:30s} {float(np.median(ts))*1e3:7.3f} ms", flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp

    from rtlsdr_ft8d_tpu.host.cache import enable_compilation_cache
    enable_compilation_cache()
    from rtlsdr_ft8d_tpu.host.synth import synthesize_message
    from rtlsdr_ft8d_tpu.ops.sync import sync_scores
    from rtlsdr_ft8d_tpu.ops.sync_pallas import sync_scores_pallas
    from rtlsdr_ft8d_tpu.ops.waterfall import waterfall
    from rtlsdr_ft8d_tpu.ops.waterfall_pallas import waterfall_pallas

    B = 64
    rng = np.random.default_rng(5)
    batch = np.stack([synthesize_message(
        "CQ K1JT FN20", f0_hz=100 + 17.5 * b % 1300, noise_sigma=0.3,
        rng=rng) for b in range(B)])
    i_s = jnp.asarray(np.real(batch).astype(np.float32))
    q_s = jnp.asarray(np.imag(batch).astype(np.float32))

    wf_a = timeit("waterfall XLA", jax.jit(waterfall), i_s, q_s)
    wf_b = timeit("waterfall PALLAS", waterfall_pallas, i_s, q_s)
    d = np.abs(np.asarray(wf_a).astype(int) - np.asarray(wf_b).astype(int))
    print(f"    wf max|d|={d.max()} frac_exact={(d == 0).mean():.6f}")

    s_a = timeit("sync_scores XLA", jax.jit(sync_scores), wf_a)
    s_b = timeit("sync_scores PALLAS", jax.jit(sync_scores_pallas), wf_a)
    print(f"    sync bit-exact: {bool((np.asarray(s_a) == np.asarray(s_b)).all())}")

    from rtlsdr_ft8d_tpu.ops.llr import _llrs_from_mags, _tone_mags_flat_xla
    from rtlsdr_ft8d_tpu.ops.llr_pallas import tone_mags_flat_pallas
    from rtlsdr_ft8d_tpu.ops.sync import find_sync

    cand = jax.jit(find_sync)(wf_a)
    BUDGET = 1024
    flat_score = cand["score"].reshape(-1)
    _, sel = jax.lax.top_k(flat_score, BUDGET)
    chan_idx = sel // cand["score"][0].size
    cand_flat = {k: cand[k].reshape(-1)[sel] for k in
                 ("time_sub", "freq_sub", "time_offset", "freq_offset")}

    def llr_with(tone_mags):
        def f(wf, cf, ci):
            return _llrs_from_mags(*tone_mags(wf, cf, ci))
        return jax.jit(f)

    l_a = timeit("llr flat XLA", llr_with(_tone_mags_flat_xla),
                 wf_a, cand_flat, chan_idx)
    l_b = timeit("llr flat PALLAS", llr_with(tone_mags_flat_pallas),
                 wf_a, cand_flat, chan_idx)
    print(f"    llr bit-exact: "
          f"{bool((np.asarray(l_a) == np.asarray(l_b)).all())}")

    import scripts.profile_bp as bp
    bp.main()


if __name__ == "__main__":
    main()
