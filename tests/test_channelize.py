"""PFB channelizer: tone placement and wideband multi-channel decode."""

import numpy as np
import jax.numpy as jnp

from rtlsdr_ft8d_tpu.ops.channelize import (StreamingChannelizer,
                                            channel_center_hz, channelize)
from rtlsdr_ft8d_tpu.ops.decimate import HISTORY, R
from rtlsdr_ft8d_tpu.pipeline import decode_window
from rtlsdr_ft8d_tpu.protocol.constants import (BLOCK_SIZE, CAPTURE_RATE,
                                                DOWNSAMPLING,
                                                TONE_SPACING_HZ)
from rtlsdr_ft8d_tpu.protocol.encode import encode
from rtlsdr_ft8d_tpu.protocol.pack import pack77


def _tone(freq_hz, n, amp=1.0):
    t = np.arange(n) / CAPTURE_RATE
    return (amp * np.exp(2j * np.pi * freq_hz * t)).astype(np.complex64)


def test_tone_lands_in_channel():
    m = 3200  # one second of output
    n = HISTORY + m * R
    x = _tone(5 * 3200 + 300.0, n)
    i_ch, q_ch = channelize(jnp.asarray(np.real(x)), jnp.asarray(np.imag(x)))
    i_ch, q_ch = np.asarray(i_ch), np.asarray(q_ch)
    power = (i_ch ** 2 + q_ch ** 2).mean(axis=1)
    k = int(np.argmax(power))
    assert k == 5, k
    # offset within the channel must be ~300 Hz
    z = i_ch[5] + 1j * q_ch[5]
    spec = np.abs(np.fft.fft(z))
    f = np.fft.fftfreq(z.shape[0], 1.0 / 3200)
    assert abs(f[int(np.argmax(spec))] - 300.0) < 5


def test_channel_center_hz():
    assert channel_center_hz(0) == 0
    assert channel_center_hz(5) == 16000
    assert channel_center_hz(749) == -3200


def _wideband_ft8(message, channel, offset_hz, n, amp=0.3, rng=None):
    tones = encode(pack77(message))
    sps = BLOCK_SIZE * DOWNSAMPLING
    x = np.zeros(n, dtype=np.complex64)
    phi, idx = 0.0, HISTORY  # start after the filter history
    for tone in tones:
        f = channel * 3200.0 + offset_hz + (float(tone) - 3.5) \
            * TONE_SPACING_HZ
        dphi = 2 * np.pi * f / CAPTURE_RATE
        end = min(idx + sps, n)
        ph = phi + dphi * np.arange(end - idx)
        x[idx:end] += amp * np.exp(1j * ph)
        phi = (phi + dphi * sps) % (2 * np.pi)
        idx += sps
    return x


def test_wideband_two_channels_decode():
    """Two FT8 signals in different 3200-Hz channels of one capture."""
    m = 48000
    n = HISTORY + m * R
    rng = np.random.default_rng(0)
    x = (_wideband_ft8("CQ K1JT FN20", 17, 500.0, n)
         + _wideband_ft8("K1ABC W9XYZ EN37", 42, 900.0, n))
    x += 0.005 * (rng.standard_normal(n)
                  + 1j * rng.standard_normal(n)).astype(np.complex64)
    i_ch, q_ch = channelize(jnp.asarray(np.real(x)), jnp.asarray(np.imag(x)))
    i_ch, q_ch = np.asarray(i_ch), np.asarray(q_ch)
    res = decode_window((np.stack([i_ch[17], i_ch[42]]),
                         np.stack([q_ch[17], q_ch[42]])))
    assert "CQ K1JT FN20" in {d.text for d in res[0]}
    assert "K1ABC W9XYZ EN37" in {d.text for d in res[1]}
    d = [d for d in res[0] if d.text == "CQ K1JT FN20"][0]
    assert abs(d.freq_hz - (500.0 - 3.5 * TONE_SPACING_HZ)) < 7


def test_streaming_channelizer_matches_oneshot():
    m = 64
    x = (np.random.default_rng(1).standard_normal(m * R)
         .astype(np.float32))
    q = np.zeros_like(x)
    ref_i, ref_q = channelize(
        jnp.asarray(np.concatenate([np.zeros(HISTORY, np.float32), x])),
        jnp.asarray(np.concatenate([np.zeros(HISTORY, np.float32), q])))
    sc = StreamingChannelizer()
    out_i, out_q = [], []
    pos = 0
    for chunk in (24, 40):
        oi, oq = sc.process(x[pos:pos + chunk * R], q[pos:pos + chunk * R])
        out_i.append(oi); out_q.append(oq)
        pos += chunk * R
    got_i = np.concatenate(out_i, axis=1)
    np.testing.assert_allclose(got_i, np.asarray(ref_i), rtol=1e-4,
                               atol=1e-5)
