"""FT8 encoder: 77-bit payload -> 79 channel symbols.

Pipeline: payload -> +CRC-14 -> LDPC(174,91) systematic encode -> 3-bit
groups -> Gray map -> insert Costas sync at symbols 0/36/72.
Parity target: reference golden vector at /root/reference/rtlsdr_ft8d.c:919-923.
"""

import numpy as np

from .constants import (COSTAS_OFFSETS, COSTAS_PATTERN, DATA_SYMBOL_IDX,
                        FT8_LDPC_K, FT8_LDPC_N, FT8_NN, GRAY_MAP)
from .crc import add_crc
from .generator import generator_matrix

_G = None


def _gen():
    global _G
    if _G is None:
        _G = generator_matrix()
    return _G


def bytes_to_bits(data: bytes, nbits: int) -> np.ndarray:
    """Unpack MSB-first bytes into a bit vector of length nbits."""
    arr = np.frombuffer(data, dtype=np.uint8)
    bits = np.unpackbits(arr)[:nbits]
    return bits.astype(np.uint8)


def bits_to_bytes(bits: np.ndarray) -> bytes:
    return np.packbits(np.asarray(bits, dtype=np.uint8)).tobytes()


def ldpc_encode(message_bits: np.ndarray) -> np.ndarray:
    """91 message bits -> 174-bit systematic codeword [message | parity]."""
    assert len(message_bits) == FT8_LDPC_K
    m = np.asarray(message_bits, dtype=np.uint8)
    parity = (_gen() @ m) & 1
    cw = np.concatenate([m, parity.astype(np.uint8)])
    assert cw.shape[0] == FT8_LDPC_N
    return cw


def codeword_to_tones(codeword: np.ndarray) -> np.ndarray:
    """174-bit codeword -> 79 tones (Costas at 0/36/72, Gray-mapped data)."""
    groups = codeword.reshape(58, 3)
    vals = groups[:, 0] * 4 + groups[:, 1] * 2 + groups[:, 2]
    tones = np.zeros(FT8_NN, dtype=np.int32)
    for off in COSTAS_OFFSETS:
        tones[off:off + 7] = COSTAS_PATTERN
    tones[DATA_SYMBOL_IDX] = GRAY_MAP[vals]
    return tones


def encode(payload_bits: np.ndarray) -> np.ndarray:
    """77 payload bits -> 79 channel tones."""
    return codeword_to_tones(ldpc_encode(add_crc(payload_bits)))


def tones_to_codeword(tones: np.ndarray) -> np.ndarray:
    """Inverse of codeword_to_tones (hard-decision path, used by tests)."""
    from .constants import GRAY_INV
    vals = GRAY_INV[np.asarray(tones)[DATA_SYMBOL_IDX]]
    bits = np.zeros((58, 3), dtype=np.uint8)
    bits[:, 0] = (vals >> 2) & 1
    bits[:, 1] = (vals >> 1) & 1
    bits[:, 2] = vals & 1
    return bits.reshape(-1)
