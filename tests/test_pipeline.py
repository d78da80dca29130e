"""End-to-end loopback tests: encode -> modulate -> decode.

Mirrors the reference self-test strategy (/root/reference/rtlsdr_ft8d.c:
913-972) but checks the FULL text of every expected message (the reference's
own check is bugged — SURVEY.md §8) and sweeps SNR and placement.
"""

import numpy as np
import pytest

from rtlsdr_ft8d_tpu.host.synth import synthesize_message, synthesize_tones
from rtlsdr_ft8d_tpu.pipeline import decode_window
from rtlsdr_ft8d_tpu.protocol.constants import GOLDEN_TONES


def texts(decodes):
    return {d.text for d in decodes}


def test_selftest_loopback():
    """The reference's self-test scenario: CQ K1JT FN20QI @ 50 Hz."""
    iq = synthesize_message("CQ K1JT FN20QI", f0_hz=50.0, noise_sigma=0.02,
                            rng=np.random.default_rng(1))
    decodes = decode_window(iq)
    assert "CQ K1JT FN20" in texts(decodes)
    d = [d for d in decodes if d.text == "CQ K1JT FN20"][0]
    assert d.call == "K1JT"
    assert d.loc == "FN20"


def test_golden_tones_decode():
    iq = synthesize_tones(GOLDEN_TONES, f0_hz=625.0, noise_sigma=0.1,
                          rng=np.random.default_rng(2))
    assert "CQ K1JT FN20" in texts(decode_window(iq))


@pytest.mark.parametrize("sigma,expect", [(0.5, True), (1.0, True),
                                          (2.0, True)])
def test_snr_sweep(sigma, expect):
    """amp 0.5 tone vs complex noise: sigma=2.0 is about -14 dB SNR(2.5kHz)."""
    iq = synthesize_message("K1ABC W9XYZ R-09", f0_hz=812.5,
                            noise_sigma=sigma, rng=np.random.default_rng(4))
    assert ("K1ABC W9XYZ R-09" in texts(decode_window(iq))) == expect


def test_multiple_messages_one_window():
    rng = np.random.default_rng(9)
    iq = (synthesize_message("CQ K1JT FN20", f0_hz=200.0, noise_sigma=0.0)
          + synthesize_message("K1ABC W9XYZ EN37", f0_hz=700.0,
                               noise_sigma=0.0)
          + synthesize_message("W9XYZ K1ABC RR73", f0_hz=1212.5,
                               noise_sigma=0.1, rng=rng))
    got = texts(decode_window(iq))
    assert {"CQ K1JT FN20", "K1ABC W9XYZ EN37", "W9XYZ K1ABC RR73"} <= got


def test_batch_channels():
    ch0 = synthesize_message("CQ VA2GKA FN35", f0_hz=400.0, noise_sigma=0.2,
                             rng=np.random.default_rng(11))
    ch1 = synthesize_message("CQ DX W9XYZ EN37", f0_hz=931.25,
                             noise_sigma=0.2, rng=np.random.default_rng(12))
    res = decode_window(np.stack([ch0, ch1]))
    assert "CQ VA2GKA FN35" in texts(res[0])
    assert "CQ DX W9XYZ EN37" in texts(res[1])


def test_time_offset_robustness():
    """Signal starting 1 s into the window must still decode."""
    iq = synthesize_message("CQ K1JT FN20", f0_hz=525.0, noise_sigma=0.1,
                            start_sample=3200, rng=np.random.default_rng(13))
    decodes = decode_window(iq)
    assert "CQ K1JT FN20" in texts(decodes)
    d = [d for d in decodes if d.text == "CQ K1JT FN20"][0]
    assert 0.7 < d.time_sec < 1.3


def test_dedup_single_message():
    iq = synthesize_message("CQ K1JT FN20", f0_hz=493.75, noise_sigma=0.02)
    decodes = decode_window(iq)
    assert len([d for d in decodes if d.text == "CQ K1JT FN20"]) == 1


def test_ap_cq_decodes_deeper():
    """AP pass recovers CQ messages the blind pass misses near -20 dB."""
    rng = np.random.default_rng(99)
    chans = np.stack([
        synthesize_message("CQ K1JT FN20", f0_hz=300 + 12.5 * t,
                           amplitude=0.5, noise_sigma=4.0, rng=rng)
        for t in range(24)])
    blind = decode_window(chans)
    ap = decode_window(chans, ap_cq=True)
    n_blind = sum("CQ K1JT FN20" in {d.text for d in r} for r in blind)
    n_ap = sum("CQ K1JT FN20" in {d.text for d in r} for r in ap)
    assert n_ap > n_blind, (n_blind, n_ap)


def test_ap_no_false_decodes_on_noise():
    rng = np.random.default_rng(123)
    iq = (rng.standard_normal(48000)
          + 1j * rng.standard_normal(48000)).astype(np.complex64)
    assert decode_window(iq, ap_cq=True) == []


def test_budget_zero_is_unbudgeted():
    """An explicit --budget 0 means 'no budget' — it must not run top_k
    with k=0 and silently decode nothing (ADVICE r2)."""
    iq = synthesize_message("CQ K1JT FN20", f0_hz=500.0, noise_sigma=0.1,
                            rng=np.random.default_rng(7))
    assert "CQ K1JT FN20" in texts(decode_window(iq, budget=0))


def test_osd_quota_clamped_to_candidate_count():
    """osd_cands exceeding num_candidates on a small batch must clamp the
    selection to B*K, not crash lax.top_k at trace time (ADVICE r2)."""
    iq = synthesize_message("CQ K1JT FN20", f0_hz=500.0, noise_sigma=0.1,
                            rng=np.random.default_rng(8))
    res = decode_window(iq, num_candidates=16, osd_cands=150)
    assert "CQ K1JT FN20" in texts(res)


def test_global_budget_decodes_active_channels():
    """budget=N runs BP only on the N best candidates across channels;
    signals still decode, quiet channels cost nothing."""
    import numpy as np

    from rtlsdr_ft8d_tpu.host.synth import synthesize_message
    from rtlsdr_ft8d_tpu.pipeline import decode_window

    rng = np.random.default_rng(3)
    chans = []
    msgs = {}
    for b in range(8):
        if b in (2, 5):
            m = f"CQ K1JT FN2{b}"
            msgs[b] = m
            chans.append(synthesize_message(m, f0_hz=400 + 50 * b,
                                            noise_sigma=0.1,
                                            rng=np.random.default_rng(b)))
        else:
            chans.append((0.01 * rng.standard_normal(48000)
                          + 0.01j * rng.standard_normal(48000))
                         .astype(np.complex64))
    batch = np.stack(chans)
    res = decode_window(batch, budget=64)
    for b, m in msgs.items():
        assert m in {d.text for d in res[b]}, (b, res[b])
    # quiet channels: no false decodes under the budget either
    for b in range(8):
        if b not in msgs:
            assert not res[b]


def test_osd_recovers_bp_failures_and_noise_stays_clean():
    """OSD reprocessing of BP-failed candidates (ops/osd.py) decodes
    below the BP threshold; pure noise must stay decode-free."""
    import numpy as np

    from rtlsdr_ft8d_tpu.host.synth import synthesize_message
    from rtlsdr_ft8d_tpu.pipeline import decode_window

    sigma = 0.1
    m = "CQ K1JT FN07"

    def amp_for(snr_db):
        return np.sqrt(10 ** (snr_db / 10.0) * 2 * sigma * sigma
                       * 2500.0 / 3200.0)

    N = 16
    snr = -19.5
    chans = [synthesize_message(m, f0_hz=400 + 25 * t,
                                amplitude=amp_for(snr), noise_sigma=sigma,
                                rng=np.random.default_rng(500 + t))
             for t in range(N)]
    batch = np.stack(chans)
    plain = decode_window(batch)
    osd = decode_window(batch, osd_cands=8)
    n_plain = sum(1 for b in range(N) if m in {d.text for d in plain[b]})
    n_osd = sum(1 for b in range(N) if m in {d.text for d in osd[b]})
    assert n_osd > n_plain, (n_plain, n_osd)

    rng = np.random.default_rng(0)
    noise = (sigma * rng.standard_normal((N, 48000))
             + 1j * sigma * rng.standard_normal((N, 48000))
             ).astype(np.complex64)
    res = decode_window(noise, osd_cands=8)
    assert sum(len(r) for r in res) == 0


def test_mycall_ap_recovers_addressed_replies():
    """ap_call clamps the c28a prefix to the operator's own callsign,
    recovering weak replies addressed TO this station; noise stays
    clean."""
    import numpy as np

    from rtlsdr_ft8d_tpu.host.synth import synthesize_message
    from rtlsdr_ft8d_tpu.pipeline import ap_prefix_for_call, decode_window
    from rtlsdr_ft8d_tpu.protocol.pack import pack77

    # the clamp row's known bits must equal the real packed bits of an
    # addressed message; everything past the 29-bit prefix is free (0)
    bits = pack77("VA2GKA W9XYZ R-17").astype(np.float32)
    row = ap_prefix_for_call("VA2GKA")
    assert row is not None and row.shape == (77,)
    assert np.array_equal((row[:29] > 0).astype(np.float32), bits[:29])
    assert np.all(row[29:] == 0)
    # nonstandard calls have no fixed c28 prefix
    assert ap_prefix_for_call("PJ4/K1ABC") is None

    sigma = 0.1
    amp = np.sqrt(10 ** (-18.5 / 10.0) * 2 * sigma * sigma * 2500.0 / 3200.0)
    m = "VA2GKA W9XYZ R-17"
    N = 12
    chans = [synthesize_message(m, f0_hz=400 + 30 * t, amplitude=amp,
                                noise_sigma=sigma,
                                rng=np.random.default_rng(800 + t))
             for t in range(N)]
    batch = np.stack(chans)
    n_plain = sum(1 for r in decode_window(batch)
                  if m in {d.text for d in r})
    n_ap = sum(1 for r in decode_window(batch, ap_call="VA2GKA")
               if m in {d.text for d in r})
    assert n_ap >= n_plain
    assert n_ap >= 4

    rng = np.random.default_rng(0)
    noise = (sigma * rng.standard_normal((8, 48000))
             + 1j * sigma * rng.standard_normal((8, 48000))
             ).astype(np.complex64)
    res = decode_window(noise, ap_cq=True, ap_call="VA2GKA", osd_cands=4)
    assert sum(len(r) for r in res) == 0
