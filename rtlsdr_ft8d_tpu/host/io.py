"""IQ capture file I/O: .iq, .c2 and .wav formats.

Format contracts from the reference (C17, /root/reference/rtlsdr_ft8d.c):
  .iq  — raw float32 interleaved I,Q at 3200 sps, Q NEGATED on both read and
         write (wsprsim convention, c:760,795).
  .c2  — 14-byte name, int32 type, float64 dial frequency header, then the
         same negated-Q interleaved float32 payload (c:809-830).
  .wav — ft8_lib-style mono PCM16 audio (typically 12000 sps); converted to
         3200 sps complex baseband analytically (positive-frequency bins
         0..3200 Hz via FFT), so ft8_lib reference captures decode directly.

Read functions return raw (i, q) float32 arrays; the decode pipeline applies
the -3 dB per-window normalization on device (reference normalizes in the
reader, c:763-778 — same math, different place, same decode input).
"""

import struct
import wave
from datetime import datetime, timezone

import numpy as np

from ..protocol.constants import SIGNAL_LENGTH_S, SIGNAL_SAMPLE_RATE

WINDOW = SIGNAL_LENGTH_S * SIGNAL_SAMPLE_RATE  # 48000


def read_iq(path):
    """Read a .iq file -> (i, q) float32 arrays (Q un-negated)."""
    raw = np.fromfile(path, dtype=np.float32)
    n = raw.shape[0] // 2
    i = raw[0:2 * n:2].copy()
    q = -raw[1:2 * n:2]
    return i, q


def write_iq(path, i_samples, q_samples):
    """Write a .iq file (negating Q, wsprsim convention)."""
    i_samples = np.asarray(i_samples, np.float32)
    q_samples = np.asarray(q_samples, np.float32)
    buf = np.empty(i_samples.shape[0] * 2, np.float32)
    buf[0::2] = i_samples
    buf[1::2] = -q_samples
    buf.tofile(path)
    return i_samples.shape[0]


def read_c2(path):
    """Read a .c2 file -> (i, q, dial_freq_hz)."""
    with open(path, "rb") as f:
        f.read(14)                       # name, unused
        struct.unpack("<i", f.read(4))   # type, unused
        (freq,) = struct.unpack("<d", f.read(8))
        raw = np.frombuffer(f.read(), dtype=np.float32)
    n = raw.shape[0] // 2
    i = raw[0:2 * n:2].copy()
    q = -raw[1:2 * n:2]
    return i, q, freq


def write_c2(path, i_samples, q_samples, dial_freq_hz, name=""):
    i_samples = np.asarray(i_samples, np.float32)
    q_samples = np.asarray(q_samples, np.float32)
    with open(path, "wb") as f:
        f.write(name.encode()[:14].ljust(14, b"\0"))
        f.write(struct.pack("<i", 2))
        f.write(struct.pack("<d", float(dial_freq_hz)))
        buf = np.empty(i_samples.shape[0] * 2, np.float32)
        buf[0::2] = i_samples
        buf[1::2] = -q_samples
        f.write(buf.tobytes())
    return i_samples.shape[0]


def read_wav(path):
    """Read a mono PCM16 wav -> (samples float32 in [-1, 1], sample_rate)."""
    path = str(path)
    with wave.open(path, "rb") as w:
        assert w.getsampwidth() == 2, "PCM16 expected"
        rate = w.getframerate()
        nch = w.getnchannels()
        frames = w.readframes(w.getnframes())
    x = np.frombuffer(frames, dtype=np.int16).astype(np.float32) / 32768.0
    if nch > 1:
        x = x.reshape(-1, nch)[:, 0].copy()
    return x, rate


def wav_to_baseband(path):
    """Real audio wav -> (i, q) complex baseband at 3200 sps, 48000 samples.

    The analytic resample: positive-frequency bins 0..3200 Hz of the 15-s
    capture become the complex spectrum of the 3200 sps baseband.
    """
    x, rate = read_wav(path)
    want = SIGNAL_LENGTH_S * rate
    if x.shape[0] < want:
        x = np.concatenate([x, np.zeros(want - x.shape[0], np.float32)])
    x = x[:want]
    spec = np.fft.fft(x)
    nbins = WINDOW  # bins 0..48000 at 1/15 Hz spacing -> 0..3200 Hz
    base = np.zeros(nbins, dtype=np.complex128)
    base[:] = spec[:nbins]
    out = np.fft.ifft(base) * (nbins / x.shape[0]) * 2.0
    return (np.real(out).astype(np.float32),
            np.imag(out).astype(np.float32))


def read_any(path):
    """Dispatch on extension like the reference's decodeRecordedFile
    (c:859-887). Returns (i, q, dial_freq_or_None)."""
    lower = str(path).lower()
    if lower.endswith(".iq"):
        i, q = read_iq(path)
        return i, q, None
    if lower.endswith(".c2"):
        return read_c2(path)
    if lower.endswith(".wav"):
        i, q = wav_to_baseband(path)
        return i, q, None
    raise ValueError(f"unsupported capture format: {path}")


def timestamped_name(prefix: str, when=None) -> str:
    """saveSample filename convention (c:674-681)."""
    when = when or datetime.now(timezone.utc)
    return (f"{prefix[:8]}_{when.year:04d}-{when.month:02d}-{when.day:02d}"
            f"_{when.hour:02d}-{when.minute:02d}-{when.second:02d}.iq")
