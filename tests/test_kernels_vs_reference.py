"""Cross-check vectorized TPU kernels against the naive loop reference."""

import os
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtlsdr_ft8d_tpu.host.synth import synthesize_message
from rtlsdr_ft8d_tpu.ops.ldpc import bp_decode, crc_check
from rtlsdr_ft8d_tpu.ops.llr import extract_llrs
from rtlsdr_ft8d_tpu.ops.sync import (NUM_FREQ_OFFSETS, TIME_OFFSET_MIN,
                                      find_sync, sync_scores)
from rtlsdr_ft8d_tpu.ops.waterfall import waterfall
from rtlsdr_ft8d_tpu.protocol.crc import add_crc
from rtlsdr_ft8d_tpu.protocol.encode import ldpc_encode

from . import reference_impl as ref


@pytest.fixture(scope="module")
def iq():
    return np.asarray(synthesize_message(
        "CQ K1JT FN20QI", f0_hz=487.5, noise_sigma=0.3,
        rng=np.random.default_rng(3)))


@pytest.fixture(scope="module")
def wf_pair(iq):
    i_s = jnp.asarray(np.real(iq)[None].astype(np.float32))
    q_s = jnp.asarray(np.imag(iq)[None].astype(np.float32))
    wf_jax = np.asarray(jax.jit(waterfall)(i_s, q_s))[0]
    wf_ref = ref.waterfall_ref(iq)
    return wf_jax, wf_ref


def test_waterfall_matches_reference(wf_pair):
    wf_jax, wf_ref = wf_pair
    # float32 FFT vs float64 reference: allow off-by-one quantization on a
    # tiny fraction of cells, but demand exact match on >99.9%
    diff = np.abs(wf_jax.astype(int) - wf_ref.astype(int))
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.999


def test_sync_scores_match_reference(wf_pair):
    wf_jax, _ = wf_pair
    scores = np.asarray(sync_scores(jnp.asarray(wf_jax[None])))[0]
    rng = np.random.default_rng(0)
    for _ in range(200):
        ts, fs = rng.integers(0, 2), rng.integers(0, 2)
        to = rng.integers(-12, 24)
        fo = rng.integers(0, NUM_FREQ_OFFSETS)
        expect = ref.sync_score_ref(wf_jax, ts, fs, to, fo)
        got = scores[ts, fs, to - TIME_OFFSET_MIN, fo]
        assert got == expect, (ts, fs, to, fo, got, expect)


def test_llr_matches_reference(wf_pair):
    wf_jax, _ = wf_pair
    cand = find_sync(jnp.asarray(wf_jax[None]))
    llrs = np.asarray(extract_llrs(jnp.asarray(wf_jax[None]), cand))[0]
    for k in range(0, 120, 17):
        ts = int(np.asarray(cand["time_sub"])[0, k])
        fs = int(np.asarray(cand["freq_sub"])[0, k])
        to = int(np.asarray(cand["time_offset"])[0, k])
        fo = int(np.asarray(cand["freq_offset"])[0, k])
        expect = ref.extract_llr_ref(wf_jax, ts, fs, to, fo)
        np.testing.assert_allclose(llrs[k], expect, rtol=1e-4, atol=1e-4)


def test_bp_decode_matches_reference(wf_pair):
    wf_jax, _ = wf_pair
    wf_j = jnp.asarray(wf_jax[None])
    cand = find_sync(wf_j)
    llrs = np.asarray(extract_llrs(wf_j, cand))[0]
    hard, err = bp_decode(jnp.asarray(llrs))
    hard, err = np.asarray(hard), np.asarray(err)
    for k in range(0, 120, 11):
        plain_ref, err_ref = ref.bp_decode_ref(llrs[k])
        assert err[k] == err_ref, (k, err[k], err_ref)
        if err_ref == 0:
            assert np.array_equal(hard[k], plain_ref)


def test_bp_decodes_clean_codeword():
    rng = np.random.default_rng(5)
    msg = rng.integers(0, 2, 91).astype(np.uint8)
    cw = ldpc_encode(msg)
    llr = jnp.asarray((2.0 * cw.astype(np.float32) - 1.0) * 4.0)
    hard, err = bp_decode(llr[None])
    assert int(err[0]) == 0
    assert np.array_equal(np.asarray(hard[0]), cw)


def test_bp_corrects_noisy_codeword():
    rng = np.random.default_rng(6)
    msg = np.zeros(77, dtype=np.uint8)
    msg[::5] = 1
    cw = ldpc_encode(add_crc(msg))
    llr = (2.0 * cw.astype(np.float32) - 1.0) * 2.0
    llr += rng.normal(0, 1.3, size=174).astype(np.float32)
    hard, err = bp_decode(jnp.asarray(llr)[None])
    assert int(err[0]) == 0
    assert np.array_equal(np.asarray(hard[0]), cw)
    assert bool(crc_check(hard)[0])


def test_minsum_decodes_like_sum_product():
    from rtlsdr_ft8d_tpu.ops.ldpc import bp_decode_minsum
    rng = np.random.default_rng(11)
    agree = 0
    for _ in range(20):
        msg = rng.integers(0, 2, 77).astype(np.uint8)
        cw = ldpc_encode(add_crc(msg))
        llr = (2.0 * cw.astype(np.float32) - 1.0) * 2.0 \
            + rng.normal(0, 1.25, 174).astype(np.float32)
        h1, e1 = bp_decode(jnp.asarray(llr)[None])
        h2, e2 = bp_decode_minsum(jnp.asarray(llr)[None])
        ok1 = int(e1[0]) == 0 and np.array_equal(np.asarray(h1[0]), cw)
        ok2 = int(e2[0]) == 0 and np.array_equal(np.asarray(h2[0]), cw)
        agree += ok1 == ok2
    assert agree >= 19


def test_pallas_bp_matches_sum_product():
    """The single-kernel Pallas decoder (interpret mode on CPU) must agree
    with the XLA sum-product decoder: identical error counts and identical
    hard decisions on every success, across codewords at several noise
    levels plus pure-noise rows."""
    from rtlsdr_ft8d_tpu.ops.ldpc_pallas import bp_decode_pallas
    from rtlsdr_ft8d_tpu.protocol.crc import add_crc
    from rtlsdr_ft8d_tpu.protocol.encode import ldpc_encode

    rng = np.random.default_rng(7)
    rows = []
    for t in range(40):
        payload = rng.integers(0, 2, 77).astype(np.uint8)
        cw = ldpc_encode(add_crc(payload)).astype(np.float32)
        scale = [4.0, 1.2, 0.7][t % 3]
        rows.append((2.0 * cw - 1.0) * scale
                    + rng.normal(0, 1.0, 174).astype(np.float32))
    for _ in range(24):
        rows.append(rng.normal(0, 2.0, 174).astype(np.float32))
    llr = jnp.asarray(np.stack(rows) * 2.0)

    h1, e1 = bp_decode(llr)
    h2, e2 = bp_decode_pallas(llr)
    h1, e1, h2, e2 = map(np.asarray, (h1, e1, h2, e2))
    assert (e1 == e2).all()
    ok = e1 == 0
    assert ok.sum() >= 14         # at least the strong rows must decode
    assert (h1[ok] == h2[ok]).all()


def test_pallas_waterfall_matches_default():
    """The fused Pallas waterfall (interpret mode on CPU) must agree with
    the XLA waterfall within one quantization step on essentially every
    cell (the only differences are explicit-bf16x3 vs f32 rounding at
    quantization boundaries)."""
    from rtlsdr_ft8d_tpu.ops.waterfall import waterfall as wf_xla
    from rtlsdr_ft8d_tpu.ops.waterfall_pallas import waterfall_pallas

    rng = np.random.default_rng(11)
    batch = np.stack([synthesize_message(
        "CQ K1JT FN20", f0_hz=300 + 100 * b, noise_sigma=0.3, rng=rng)
        for b in range(3)])
    i_s = jnp.asarray(np.real(batch).astype(np.float32))
    q_s = jnp.asarray(np.imag(batch).astype(np.float32))
    a = np.asarray(jax.jit(wf_xla)(i_s, q_s)).astype(int)
    b = np.asarray(waterfall_pallas(i_s, q_s)).astype(int)
    d = np.abs(a - b)
    assert d.max() <= 1
    assert (d == 0).mean() > 0.999


def test_pallas_sync_scores_bit_exact():
    """The Pallas sync scorer is the same integer algebra as sync_scores
    and must match it bit-for-bit."""
    from rtlsdr_ft8d_tpu.ops.sync_pallas import sync_scores_pallas

    rng = np.random.default_rng(12)
    batch = np.stack([synthesize_message(
        "CQ K1JT FN20", f0_hz=300 + 77 * b, noise_sigma=0.4, rng=rng)
        for b in range(2)])
    i_s = jnp.asarray(np.real(batch).astype(np.float32))
    q_s = jnp.asarray(np.imag(batch).astype(np.float32))
    wf = jax.jit(waterfall)(i_s, q_s)
    assert (np.asarray(sync_scores(wf))
            == np.asarray(sync_scores_pallas(wf))).all()


def test_exact_wins_over_pallas_knobs():
    """FT8_TPU_EXACT=1 must keep the XLA anchor implementations even when
    the Pallas knobs are set (env is read at import, so subprocess)."""
    import subprocess
    import sys as _sys

    code = (
        "import warnings\n"
        "from rtlsdr_ft8d_tpu.ops.knobs import pallas_selected\n"
        "with warnings.catch_warnings():\n"
        "    warnings.simplefilter('ignore')\n"
        "    assert not pallas_selected('FT8_TPU_WF_PALLAS',"
        " exact_wins=True), 'waterfall not anchored'\n"
        "    assert not pallas_selected('FT8_TPU_BP_PALLAS',"
        " exact_wins=True), 'bp not anchored'\n"
        "print('anchored')\n")
    env = dict(os.environ, FT8_TPU_EXACT="1", FT8_TPU_WF_PALLAS="1",
               FT8_TPU_BP_PALLAS="1", JAX_PLATFORMS="cpu",
               PALLAS_AXON_POOL_IPS="")
    out = subprocess.run([_sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=240)
    assert "anchored" in out.stdout, (out.stdout, out.stderr)


def test_knob_resolution_order():
    """ops/knobs.pallas_selected: explicit =1/=0 beats the platform
    default, unset resolves by backend (CPU -> XLA), EXACT wins over
    the non-bit-exact knobs, and resolution is cached per process."""
    import importlib

    from rtlsdr_ft8d_tpu.ops import knobs

    def fresh():
        k = importlib.reload(knobs)
        return k

    k = fresh()
    old = {n: os.environ.pop(n, None)
           for n in ("FT8_TPU_TESTKNOB", "FT8_TPU_EXACT")}
    try:
        # unset -> platform default; this suite runs on CPU -> False
        assert k.pallas_selected("FT8_TPU_TESTKNOB") is False
        # cached: flipping env after first resolution has no effect
        os.environ["FT8_TPU_TESTKNOB"] = "1"
        assert k.pallas_selected("FT8_TPU_TESTKNOB") is False
        k = fresh()
        assert k.pallas_selected("FT8_TPU_TESTKNOB") is True
        os.environ["FT8_TPU_TESTKNOB"] = "0"
        k = fresh()
        assert k.pallas_selected("FT8_TPU_TESTKNOB") is False
        # EXACT wins over =1 for exact_wins knobs (with a warning)
        os.environ["FT8_TPU_TESTKNOB"] = "1"
        os.environ["FT8_TPU_EXACT"] = "1"
        k = fresh()
        import warnings
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            assert k.pallas_selected("FT8_TPU_TESTKNOB",
                                     exact_wins=True) is False
        assert any("FT8_TPU_EXACT" in str(x.message) for x in w)
        # ...but not over knobs with no EXACT interplay
        k = fresh()
        assert k.pallas_selected("FT8_TPU_TESTKNOB") is True
    finally:
        os.environ.pop("FT8_TPU_TESTKNOB", None)
        os.environ.pop("FT8_TPU_EXACT", None)
        for n, v in old.items():
            if v is not None:
                os.environ[n] = v
        importlib.reload(knobs)
