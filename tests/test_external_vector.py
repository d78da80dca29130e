"""End-to-end decode of an EXTERNALLY PUBLISHED tone vector (third path).

Every other capture this repo decodes was synthesized by its own encoders
(protocol/encode.py or the C++ sibling native/ft8codec.cc), so a
shared-ancestry encode bug could pass every fixture test.  This test
breaks that loop: the 79-tone sequence below is copied VERBATIM from the
reference's published self-test documentation
(/root/reference/rtlsdr_ft8d.c:919-923 — message "CQ K1JT FN20QI",
packed bytes 00 00 00 20 4d fc dc 8a 14 08, FSK tone string), and the
waveform is synthesized HERE with ~10 lines of inline numpy replicating
the reference's own modulator (phase-continuous complex FSK at
f0=50 Hz, 512 samples/symbol, tone spacing 3200/512 = 6.25 Hz,
amplitude 0.5 — rtlsdr_ft8d.c:936-956).  Neither protocol/encode.py nor
ft8codec.cc touches the fixture-generation path; if the RX chain decodes
this waveform to exactly the published text, the waterfall / sync / LLR /
LDPC / CRC / unpack stack agrees with the external implementation.
"""

import numpy as np

from rtlsdr_ft8d_tpu.pipeline import decode_window
from rtlsdr_ft8d_tpu.protocol import constants

# Typed independently from the reference comment (NOT imported from the
# package) so a corrupted constants table cannot make this test agree
# with itself.
PUBLISHED_INPUT = "CQ K1JT FN20QI"
PUBLISHED_PACKED = bytes.fromhex("000000204dfcdc8a1408")
PUBLISHED_TONES = (
    "31406520000000010054775471060350363731406525474413421160564600"
    "65174427143140652")
# A standard type-1 message carries a 4-char grid; ft8_lib's pack77
# truncates the 6-char "FN20QI" to "FN20" (the published packed bytes
# prove it — they unpack to this text), so the on-air message is:
PUBLISHED_MESSAGE = "CQ K1JT FN20"


def test_published_vector_matches_package_table():
    # The package's golden constant must equal the reference's comment.
    assert len(PUBLISHED_TONES) == 79
    assert np.array_equal(constants.GOLDEN_TONES,
                          np.array([int(c) for c in PUBLISHED_TONES]))


def test_pack_matches_published_bytes():
    # Our pack77 must reproduce the externally published packed bytes,
    # including ft8_lib's 6-char-locator truncation behavior.
    from rtlsdr_ft8d_tpu.protocol.pack import pack77
    from rtlsdr_ft8d_tpu.protocol.unpack import unpack77
    for m in (PUBLISHED_INPUT, PUBLISHED_MESSAGE):
        bits = np.asarray(pack77(m), np.uint8)
        assert np.packbits(bits).tobytes() == PUBLISHED_PACKED, m
    pub_bits = np.unpackbits(np.frombuffer(PUBLISHED_PACKED, np.uint8))[:77]
    assert unpack77(pub_bits) == PUBLISHED_MESSAGE


def _synthesize_published(f0_hz=50.0, amp=0.5, noise=0.02, seed=7):
    """Reference-style modulator, implemented inline (c:936-956)."""
    sps = 3200
    spsym = 512
    df = sps / spsym                       # 6.25 Hz tone spacing
    tones = np.array([int(c) for c in PUBLISHED_TONES])
    n = 15 * sps
    i_s = np.zeros(n, np.float32)
    q_s = np.zeros(n, np.float32)
    phi = 0.0
    dt = 1.0 / sps
    rng = np.random.default_rng(seed)
    for k, tone in enumerate(tones):
        dphi = 2.0 * np.pi * dt * (f0_hz + (tone - 3.5) * df)
        ph = phi + dphi * np.arange(spsym)
        sl = slice(spsym * k, spsym * (k + 1))
        i_s[sl] = amp * np.cos(ph)
        q_s[sl] = amp * np.sin(ph)
        phi = (ph[-1] + dphi) % (2.0 * np.pi)
    i_s += noise * rng.standard_normal(n).astype(np.float32)
    q_s += noise * rng.standard_normal(n).astype(np.float32)
    return i_s, q_s


def test_decode_published_tone_vector():
    i_s, q_s = _synthesize_published()
    res = decode_window((i_s, q_s))
    texts = {d.text for d in res}
    assert PUBLISHED_MESSAGE in texts, texts
    # The published message must be the only decode of this capture.
    assert len(texts) == 1, texts


def test_decode_published_vector_offset_frequency():
    # Same vector placed mid-band (as on air), away from the self-test's
    # 50 Hz corner case.
    i_s, q_s = _synthesize_published(f0_hz=1312.5, noise=0.05, seed=11)
    res = decode_window((i_s, q_s))
    assert PUBLISHED_MESSAGE in {d.text for d in res}
