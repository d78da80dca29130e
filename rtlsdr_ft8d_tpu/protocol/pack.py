"""pack77: message text -> 77-bit FT8 payload.

Role-equivalent of ft8_lib's pack.c as used by the reference self-test
(/root/reference/rtlsdr_ft8d.c:927). Supports standard type-1/2 messages
(CQ/DE/QRZ tokens, standard + hashed callsigns, grids/reports), free text
(0.0) and telemetry (0.5). Verified against the reference golden vector.
"""

import numpy as np

from .constants import FT8_PAYLOAD_BITS
from .text import (A1, A2, A3, A4, FREE_TEXT_ALPHABET, MAX22, MAXGRID4,
                   NTOKENS, hash_callsign, normalize_standard)


class PackError(ValueError):
    pass


def _bits_from_int(value: int, nbits: int):
    return [(value >> (nbits - 1 - i)) & 1 for i in range(nbits)]


def pack_callsign_28(call: str) -> int:
    call = call.strip().upper()
    if call == "DE":
        return 0
    if call == "QRZ":
        return 1
    if call == "CQ":
        return 2
    if call.startswith("CQ ") or call.startswith("CQ_"):
        tail = call[3:]
        if tail.isdigit() and len(tail) == 3:
            return 3 + int(tail)
        if tail.isalpha() and 1 <= len(tail) <= 4:
            m = 0
            for ch in tail:
                m = m * 27 + (ord(ch) - ord("A") + 1)
            return 1003 + m
        raise PackError(f"bad CQ token: {call!r}")
    std = normalize_standard(call)
    if std is not None:
        n = A1.index(std[0])
        n = n * 36 + A2.index(std[1])
        n = n * 10 + A3.index(std[2])
        n = n * 27 + A4.index(std[3])
        n = n * 27 + A4.index(std[4])
        n = n * 27 + A4.index(std[5])
        return NTOKENS + MAX22 + n
    # Nonstandard callsign -> 22-bit hash, but only for tokens that are
    # valid hashable calls (the shared nonstandard-call predicate).
    # Hashing arbitrary junk (empty strings, bare '/R', '.'-containing
    # words) made structured parses LOSSY — the text no longer round-trips
    # — and diverged from the C++ codec on hostile free text (caught by
    # scripts/fuzz_extended.py: 'BXUCO /R', 'WXM.UO8 9 -D').
    if _is_nonstd_call(call):
        return NTOKENS + hash_callsign(call, 22)
    raise PackError(f"not a packable callsign: {call!r}")


def pack_grid_15(field: str, *, allow_report=True):
    """Return (g15, ir) for the third message field ('' allowed)."""
    field = field.strip().upper()
    ir = 0
    if field.startswith("R "):
        ir = 1
        field = field[2:].strip()
    elif (len(field) >= 3 and field[0] == "R" and field[1] in "+-"
          and field[2:].isdigit()):
        ir = 1
        field = field[1:]
    if field == "":
        return MAXGRID4 + 1, ir
    if field == "RRR":
        return MAXGRID4 + 2, ir
    if field == "RR73":
        return MAXGRID4 + 3, ir
    if field == "73":
        return MAXGRID4 + 4, ir
    if (len(field) in (4, 6) and field[0] in "ABCDEFGHIJKLMNOPQR"
            and field[1] in "ABCDEFGHIJKLMNOPQR"
            and field[2].isdigit() and field[3].isdigit()):
        # 6-char locators are truncated to the 4-char square (golden vector
        # packs "FN20QI" as FN20, reference rtlsdr_ft8d.c:921)
        g = ((ord(field[0]) - 65) * 18 + (ord(field[1]) - 65)) * 100 \
            + int(field[2]) * 10 + int(field[3])
        return g, ir
    # isdigit (not lstrip) so a bare '+'/'-' is a PackError, not an
    # uncaught ValueError from int() (PackError subclasses ValueError,
    # so `except PackError` would NOT have caught it)
    if allow_report and field[0] in "+-" and field[1:].isdigit():
        report = int(field)
        if -30 <= report <= 99:
            return MAXGRID4 + 35 + report, ir
    raise PackError(f"bad grid/report field: {field!r}")


def pack_free_text(text: str) -> np.ndarray:
    """Type 0.0: 13-char free text, base-42 -> 71 bits (+ n3=0, i3=0)."""
    text = text.upper()[:13].rjust(13)
    v = 0
    for ch in text:
        if ch not in FREE_TEXT_ALPHABET:
            ch = " "
        v = v * 42 + FREE_TEXT_ALPHABET.index(ch)
    bits = _bits_from_int(v, 71) + _bits_from_int(0, 3) + _bits_from_int(0, 3)
    return np.array(bits, dtype=np.uint8)


def pack_telemetry(hexstr: str) -> np.ndarray:
    """Type 0.5: up to 18 hex digits (71 bits) of telemetry."""
    v = int(hexstr, 16)
    if v >= 1 << 71:
        raise PackError("telemetry exceeds 71 bits")
    bits = _bits_from_int(v, 71) + _bits_from_int(5, 3) + _bits_from_int(0, 3)
    return np.array(bits, dtype=np.uint8)


def _try_pack_std(tokens, i3):
    """Type 1 ('/R') or type 2 ('/P'): c28 r1 c28 r1 R1 g15 i3."""
    suffix = "/R" if i3 == 1 else "/P"
    # field splitting: [call_to] [call_de] [R] [grid/report]
    if len(tokens) < 2:
        return None
    ia = 0
    # 'CQ ddd' / 'CQ ABCD' consume two tokens for the first field
    field_a = tokens[0]
    rest = tokens[1:]
    if field_a == "CQ" and rest and (rest[0].isdigit() or
                                     (rest[0].isalpha() and len(rest) >= 2)):
        if rest[0].isdigit() and len(rest[0]) == 3:
            field_a = "CQ " + rest[0]
            rest = rest[1:]
        elif rest[0].isalpha() and len(rest[0]) <= 4 and len(rest) >= 2:
            field_a = "CQ " + rest[0]
            rest = rest[1:]
    if not rest:
        return None
    field_b = rest[0]
    rest = rest[1:]
    field_c = " ".join(rest)

    def strip_suffix(c):
        # len > 2: a bare '/R' token is not a suffixed call (same rule as
        # the C++ codec; a stripped-to-empty field used to hash '')
        if len(c) > 2 and c.endswith(suffix):
            return c[:-2], 1
        return c, 0

    ca, ipa = strip_suffix(field_a)
    cb, ipb = strip_suffix(field_b)
    try:
        n28a = pack_callsign_28(ca)
        n28b = pack_callsign_28(cb)
        g15, ir = pack_grid_15(field_c)
    except PackError:
        return None
    bits = (_bits_from_int(n28a, 28) + [ipa] + _bits_from_int(n28b, 28)
            + [ipb] + [ir] + _bits_from_int(g15, 15) + _bits_from_int(i3, 3))
    return np.array(bits, dtype=np.uint8)


def _is_nonstd_call(tok: str) -> bool:
    from .text import HASH_ALPHABET
    if normalize_standard(tok) is not None or tok in ("CQ", "DE", "QRZ"):
        return False
    if (tok.endswith("/R") or tok.endswith("/P")) and \
            normalize_standard(tok[:-2]) is not None:
        return False
    # Letter-only calls (special/memorial stations like RAEM) are valid
    # nonstandard calls; require >=4 chars for them so short words in free
    # text ('TNX', 'GL') don't get misclassified, but keep 3-char forms
    # when they contain a digit or '/'.
    if not (3 <= len(tok) <= 11 and all(c in HASH_ALPHABET for c in tok)
            and any(c.isalpha() for c in tok)):
        return False
    if any(c.isdigit() or c == "/" for c in tok):
        return True
    return len(tok) >= 4


def _try_pack_nonstd(tokens):
    """Type 4: h12 c58 h1 r2 c1 — one nonstandard call sent in full."""
    from .text import HASH_ALPHABET, hash_callsign
    r2 = 0
    toks = list(tokens)
    if toks and toks[-1] in ("RRR", "RR73", "73"):
        r2 = {"RRR": 1, "RR73": 2, "73": 3}[toks.pop()]
    if len(toks) != 2:
        return None
    if toks[0] == "CQ" and _is_nonstd_call(toks[1]):
        c1, h1, h12, call = 1, 0, 0, toks[1]
    elif _is_nonstd_call(toks[0]) and normalize_standard(toks[1]):
        c1, h1, h12, call = 0, 1, hash_callsign(toks[1], 12), toks[0]
    elif normalize_standard(toks[0]) and _is_nonstd_call(toks[1]):
        c1, h1, h12, call = 0, 0, hash_callsign(toks[0], 12), toks[1]
    else:
        return None
    n58 = 0
    for ch in call.rjust(11):
        n58 = n58 * 38 + HASH_ALPHABET.index(ch)
    bits = (_bits_from_int(h12, 12) + _bits_from_int(n58, 58) + [h1]
            + _bits_from_int(r2, 2) + [c1] + _bits_from_int(4, 3))
    return np.array(bits, dtype=np.uint8)


def _try_pack_dxpedition(text: str, tokens):
    """Type 0.1: 'TO RR73; DE <HASH> +NN' -> c28 c28 h10 r5."""
    from .text import hash_callsign
    if "RR73;" not in tokens or len(tokens) != 5:
        return None
    if tokens[1] != "RR73;":
        return None
    ca, cb, hcall, rpt = tokens[0], tokens[2], tokens[3], tokens[4]
    if not (hcall.startswith("<") and hcall.endswith(">")):
        return None
    if not (rpt and rpt[0] in "+-" and rpt[1:].isdigit()):
        return None
    report = int(rpt)
    if not -30 <= report <= 32 or report % 2:
        return None
    if not (normalize_standard(ca) and normalize_standard(cb)):
        return None
    try:
        n28a = pack_callsign_28(ca)
        n28b = pack_callsign_28(cb)
    except PackError:
        return None
    h10 = hash_callsign(hcall[1:-1], 10)
    bits = (_bits_from_int(n28a, 28) + _bits_from_int(n28b, 28)
            + _bits_from_int(h10, 10)
            + _bits_from_int((report + 30) // 2, 5)
            + _bits_from_int(1, 3) + _bits_from_int(0, 3))
    return np.array(bits, dtype=np.uint8)


def _try_pack_rtty(tokens):
    """Type 3: '[TU;] A B [R] 5N9 NNNN' -> t1 c28 c28 R1 r3 s13."""
    toks = list(tokens)
    tu = 0
    if toks and toks[0] == "TU;":
        tu = 1
        toks = toks[1:]
    if len(toks) < 4:
        return None
    serial = toks[-1]
    rpt = toks[-2]
    ir = 0
    rest = toks[:-2]
    if rest and rest[-1] == "R":
        ir = 1
        rest = rest[:-1]
    if len(rest) != 2 or not serial.isdigit() or int(serial) >= 8000:
        return None
    if not (len(rpt) == 3 and rpt[0] == "5" and rpt[2] == "9"
            and rpt[1].isdigit() and 2 <= int(rpt[1]) <= 9):
        return None
    # only standard calls (a free-text message must not be captured here)
    if not all(normalize_standard(c) or c in ("CQ",) for c in rest):
        return None
    try:
        n28a = pack_callsign_28(rest[0])
        n28b = pack_callsign_28(rest[1])
    except PackError:
        return None
    bits = ([tu] + _bits_from_int(n28a, 28) + _bits_from_int(n28b, 28)
            + [ir] + _bits_from_int(int(rpt[1]) - 2, 3)
            + _bits_from_int(int(serial), 13) + _bits_from_int(3, 3))
    return np.array(bits, dtype=np.uint8)


def _try_pack_fieldday(tokens):
    """Type 0.3/0.4 (ARRL Field Day): 'A B [R] <ntx><class> <section>'
    -> c28 c28 R1 n4 k3 S7, n3=3 for ntx 1-16, n3=4 for 17-32."""
    from .text import ARRL_SECTIONS
    toks = list(tokens)
    if len(toks) < 4 or toks[-1] not in ARRL_SECTIONS:
        return None
    section = ARRL_SECTIONS.index(toks[-1]) + 1          # S7 is 1-based
    exch = toks[-2]
    if not (2 <= len(exch) <= 3 and exch[:-1].isdigit()
            and exch[-1] in "ABCDEF"):
        return None
    ntx = int(exch[:-1])
    if not 1 <= ntx <= 32:
        return None
    klass = ord(exch[-1]) - ord("A")
    rest = toks[:-2]
    ir = 0
    if rest and rest[-1] == "R":
        ir = 1
        rest = rest[:-1]
    if len(rest) != 2:
        return None
    if not all(normalize_standard(c) for c in rest):
        return None
    try:
        n28a = pack_callsign_28(rest[0])
        n28b = pack_callsign_28(rest[1])
    except PackError:
        return None
    n3 = 3 if ntx <= 16 else 4
    intx = ntx - 1 if ntx <= 16 else ntx - 17
    bits = (_bits_from_int(n28a, 28) + _bits_from_int(n28b, 28) + [ir]
            + _bits_from_int(intx, 4) + _bits_from_int(klass, 3)
            + _bits_from_int(section, 7)
            + _bits_from_int(n3, 3) + _bits_from_int(0, 3))
    return np.array(bits, dtype=np.uint8)


def pack77(text: str) -> np.ndarray:
    """Pack message text into 77 payload bits; raises PackError on failure."""
    text = " ".join(text.strip().upper().split())
    tokens = text.split(" ")
    out = _try_pack_dxpedition(text, tokens)
    if out is not None:
        return out
    out = _try_pack_rtty(tokens)
    if out is not None:
        return out
    out = _try_pack_fieldday(tokens)
    if out is not None:
        return out
    nonstd = [t for t in tokens if _is_nonstd_call(t)]
    if nonstd:
        out = _try_pack_nonstd(tokens)
        if out is not None:
            assert out.shape[0] == FT8_PAYLOAD_BITS
            return out
    # scan ALL tokens: a '/P' call sits at tokens[2] after a two-token
    # directed CQ ('CQ EU K1ABC/P IO91' is type 2)
    i3 = 2 if any(t.endswith("/P") for t in tokens) else 1
    out = _try_pack_std(tokens, i3)
    if out is not None:
        assert out.shape[0] == FT8_PAYLOAD_BITS
        return out
    return pack_free_text(text)
