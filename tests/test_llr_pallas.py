"""Pallas flat tone-magnitude kernel vs the XLA gather (interpret mode).

The kernel zero-pads instead of clip+mask, so raw s2 differs only on
INVALID symbols (where both paths' consumers apply the valid mask);
masked s2, final LLRs and SNR estimates must be bit-identical.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rtlsdr_ft8d_tpu.ops.llr import (_llrs_from_mags, _tone_mags_flat,
                                     estimate_snr_flat)
from rtlsdr_ft8d_tpu.ops.llr_pallas import (_G, _VMEM_LIMIT_BYTES,
                                            tone_mags_flat_pallas)


def _random_cands(rng, n, b):
    return {
        "time_sub": jnp.asarray(rng.integers(0, 2, n).astype(np.int32)),
        "freq_sub": jnp.asarray(rng.integers(0, 2, n).astype(np.int32)),
        "time_offset": jnp.asarray(
            rng.integers(-12, 24, n).astype(np.int32)),
        "freq_offset": jnp.asarray(
            rng.integers(0, 249, n).astype(np.int32)),
    }, jnp.asarray(rng.integers(0, b, n).astype(np.int32))


def _edge_cands(b):
    # every (to, fo) extreme, including fully/partially out-of-window dts
    tos = [-12, -11, -5, 0, 11, 23]
    fos = [0, 1, 247, 248]
    cands = [(t, f, ts, fs) for t in tos for f in fos
             for ts in (0, 1) for fs in (0, 1)]
    n = len(cands)
    arr = np.array(cands, np.int32)
    return {
        "time_offset": jnp.asarray(arr[:, 0]),
        "freq_offset": jnp.asarray(arr[:, 1]),
        "time_sub": jnp.asarray(arr[:, 2]),
        "freq_sub": jnp.asarray(arr[:, 3]),
    }, jnp.asarray((np.arange(n) % b).astype(np.int32))


@pytest.fixture(scope="module")
def wf():
    rng = np.random.default_rng(7)
    return jnp.asarray(rng.integers(0, 256, (3, 92, 2, 2, 256),
                                    dtype=np.uint8))


@pytest.mark.parametrize("maker", ["random", "edges", "unpadded"])
def test_masked_outputs_bit_identical(wf, maker):
    rng = np.random.default_rng(11)
    if maker == "random":
        cand, chan = _random_cands(rng, 4 * _G, wf.shape[0])
    elif maker == "edges":
        cand, chan = _edge_cands(wf.shape[0])      # n=96, _G-divisible
    else:
        cand, chan = _random_cands(rng, _G + 3, wf.shape[0])  # pad path

    s2_x, valid_x = _tone_mags_flat(wf, cand, chan)
    s2_p, valid_p = tone_mags_flat_pallas(wf, cand, chan)
    assert np.array_equal(np.asarray(valid_x), np.asarray(valid_p))
    vm = np.asarray(valid_x)[..., None]
    assert np.array_equal(np.asarray(s2_x) * vm, np.asarray(s2_p) * vm)

    llr_x = np.asarray(_llrs_from_mags(s2_x, valid_x))
    llr_p = np.asarray(_llrs_from_mags(s2_p, valid_p))
    assert np.array_equal(llr_x, llr_p)


def test_snr_path_matches_through_module_swap(wf, monkeypatch):
    import rtlsdr_ft8d_tpu.ops.llr as llr_mod

    rng = np.random.default_rng(3)
    cand, chan = _random_cands(rng, 2 * _G, wf.shape[0])
    ref = np.asarray(estimate_snr_flat(wf, cand, chan))
    monkeypatch.setattr(llr_mod, "_tone_mags_flat", tone_mags_flat_pallas)
    got = np.asarray(estimate_snr_flat(wf, cand, chan))
    assert np.array_equal(ref, got)


def test_knob_binds_kernel_and_matches():
    """FT8_TPU_LLR_PALLAS=1 rebinding (env read at import => subprocess)."""
    import os
    import subprocess
    import sys

    code = (
        "import numpy as np, jax.numpy as jnp\n"
        "import rtlsdr_ft8d_tpu.ops.llr as llr\n"
        "assert llr._tone_mags_flat is not llr._tone_mags_flat_xla\n"
        "rng = np.random.default_rng(0)\n"
        "wf = jnp.asarray(rng.integers(0, 256, (2, 92, 2, 2, 256),"
        " dtype=np.uint8))\n"
        "cand = {'time_sub': jnp.asarray(rng.integers(0, 2, 32)"
        ".astype(np.int32)),\n"
        "        'freq_sub': jnp.asarray(rng.integers(0, 2, 32)"
        ".astype(np.int32)),\n"
        "        'time_offset': jnp.asarray(rng.integers(-12, 24, 32)"
        ".astype(np.int32)),\n"
        "        'freq_offset': jnp.asarray(rng.integers(0, 249, 32)"
        ".astype(np.int32))}\n"
        "chan = jnp.asarray(rng.integers(0, 2, 32).astype(np.int32))\n"
        "got = llr.extract_llrs_flat(wf, cand, chan)\n"
        "ref = llr._llrs_from_mags(*llr._tone_mags_flat_xla(wf, cand,"
        " chan))\n"
        "assert (np.asarray(got) == np.asarray(ref)).all()\n"
        "print('llr knob ok')\n")
    env = dict(os.environ, FT8_TPU_LLR_PALLAS="1", JAX_PLATFORMS="cpu",
               PALLAS_AXON_POOL_IPS="")
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=240)
    assert "llr knob ok" in out.stdout, (out.stdout, out.stderr)


def test_wideband_falls_back_to_xla(monkeypatch):
    calls = {"xla": 0}

    import rtlsdr_ft8d_tpu.ops.llr as llr_mod
    real = llr_mod._tone_mags_flat_xla

    def spy(wf, cand, chan):
        calls["xla"] += 1
        return real(wf, cand, chan)

    monkeypatch.setattr(llr_mod, "_tone_mags_flat_xla", spy)
    b_big = _VMEM_LIMIT_BYTES // (4 * 104 * 256) + 1
    rng = np.random.default_rng(1)
    wf_small = jnp.asarray(rng.integers(
        0, 256, (2, 92, 2, 2, 256), dtype=np.uint8))
    # fake a big batch by tiling metadata only: build a real big wf lazily
    wf_big = jnp.zeros((b_big, 92, 2, 2, 256), jnp.uint8)
    cand, chan = _random_cands(rng, _G, 2)
    tone_mags_flat_pallas(wf_big, cand, chan)
    assert calls["xla"] == 1
    tone_mags_flat_pallas(wf_small, cand, chan)
    assert calls["xla"] == 1
