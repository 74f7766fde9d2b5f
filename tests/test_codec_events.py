"""Decode-EVENT-stream differential against CPython's codecs.

Second-sources the decode ENGINES (not just the tables, which
tests/test_whatwg_tables.py audits against glibc iconv): CPython's
codec implementations are an independent lineage from encoding_rs, so
agreement on event positions/lengths/codepoints breaks the
common-mode risk of all three in-repo engines sharing one author's
reading of the WHATWG algorithms (VERDICT r4 task 8).

Three tiers:
1. EXHAUSTIVE single-byte: every byte value of every single-byte
   encoding vs the Python codec, modulo three documented divergence
   classes (below).
2. Valid multi-byte streams: random text encoded BY PYTHON for
   gb18030 / Shift_JIS(cp932) / EUC-KR(cp949) / EUC-JP / Big5(hkscs) /
   GBK; our event stream must equal the per-char re-encode
   segmentation exactly - positions, byte lengths, codepoints.
3. Structurally invalid streams: valid text with injected junk bytes
   both lineages reject; the FIRST error byte offset must agree.

Documented deliberate divergences (all verified against the WHATWG
spec text; our side follows WHATWG):
- windows-125x / windows-874: WHATWG maps the undefined 0x80-0x9F
  slots to the C1 controls (the index files carry them); CPython's
  cp125x error there.
- KOI8-U 0xAE/0xBE: WHATWG follows the 2000 update (U+045E/U+040E
  ue/UE); CPython keeps the RFC 2319 box-drawing chars.
- macintosh 0xBD: WHATWG U+2126 OHM SIGN; CPython U+03A9 OMEGA.
- Shift_JIS 0xA0/0xFD/0xFE/0xFF: CPython's cp932 maps them into the
  PUA (U+F8F0..F8F3); WHATWG errors - so the error-injection tier
  corrupts PAIR TRAIL bytes for Shift_JIS instead of using them.
- Index coverage (cp932 IBM/NEC rows, GBK/GB18030-added two-byte
  code points) differs between lineages; tier 3 therefore only
  injects STRUCTURAL junk, and tier 2 only uses Python-encodable
  chars (WHATWG indexes are a superset there - zero divergences
  observed over the sampled pools).
- gb18030/GBK 0x80: WHATWG decoder step 7 maps the bare byte to
  U+20AC (the GBK euro quirk); CPython's gb18030/gbk error. Pinned
  explicitly below - tier 3's 0xFF-only injection cannot reach it
  (and this exact byte was a real three-engine divergence from the
  reference until round 5).
"""

import numpy as np
import pytest

from stringsext_tpu.encodings import full_byte_table
from stringsext_tpu.engine.events import generate_events

PY_SINGLE_BYTE = {
    "IBM866": "cp866", "KOI8-R": "koi8_r", "KOI8-U": "koi8_u",
    "macintosh": "mac_roman", "x-mac-cyrillic": "mac_cyrillic",
    "windows-1250": "cp1250", "windows-1251": "cp1251",
    "windows-1252": "cp1252", "windows-1253": "cp1253",
    "windows-1254": "cp1254", "windows-1255": "cp1255",
    "windows-1256": "cp1256", "windows-1257": "cp1257",
    "windows-1258": "cp1258", "windows-874": "cp874",
    "ISO-8859-2": "iso8859_2", "ISO-8859-3": "iso8859_3",
    "ISO-8859-4": "iso8859_4", "ISO-8859-5": "iso8859_5",
    "ISO-8859-6": "iso8859_6", "ISO-8859-7": "iso8859_7",
    "ISO-8859-8": "iso8859_8", "ISO-8859-8-I": "iso8859_8",
    "ISO-8859-10": "iso8859_10", "ISO-8859-13": "iso8859_13",
    "ISO-8859-14": "iso8859_14", "ISO-8859-15": "iso8859_15",
    "ISO-8859-16": "iso8859_16",
}


def _allowed_single_byte_divergence(enc: str, b: int, ours: int,
                                    pythons: int) -> bool:
    if (enc.startswith("windows-") and 0x80 <= b <= 0x9F
            and ours == b and pythons == -1):
        return True  # WHATWG C1-control slots vs cp125x holes
    if enc == "KOI8-U" and b in (0xAE, 0xBE) and ours in (0x45E, 0x40E):
        return True  # 2000 update vs RFC 2319 box drawing
    if enc == "macintosh" and b == 0xBD and ours == 0x2126:
        return True  # OHM SIGN vs OMEGA
    if enc == "windows-1255" and b == 0xCA and ours == 0x5BA:
        return True  # HOLAM HASER FOR VAV, added to the WHATWG index;
        # absent from the original MS table CPython ships
    return False


@pytest.mark.parametrize("enc,py", sorted(PY_SINGLE_BYTE.items()))
def test_single_byte_exhaustive(enc, py):
    tbl = full_byte_table(enc)
    for b in range(256):
        try:
            cp = ord(bytes([b]).decode(py, "strict"))
        except (UnicodeDecodeError, ValueError):
            cp = -1
        ours = int(tbl[b])
        if ours != cp:
            assert _allowed_single_byte_divergence(enc, b, ours, cp), (
                f"{enc} byte {b:#04x}: ours {ours:#x} vs {py} {cp:#x}"
            )


MB_PAIRS = [
    ("gb18030", "gb18030"), ("Shift_JIS", "cp932"),
    ("EUC-KR", "cp949"), ("EUC-JP", "euc_jp"),
    ("Big5", "big5hkscs"), ("GBK", "gbk"),
]

_POOL = (
    [chr(c) for c in range(0x20, 0x7F)]
    + [chr(c) for c in range(0x4E00, 0x4F00)]  # CJK ideographs
    + [chr(c) for c in range(0x3041, 0x3093)]  # hiragana
    + [chr(c) for c in range(0x30A1, 0x30F6)]  # katakana
    + [chr(c) for c in range(0xAC00, 0xAD00)]  # hangul
    + [chr(c) for c in range(0x0410, 0x0430)]  # cyrillic
)


def _random_text(rng, py, n_chars):
    chars = []
    for _ in range(n_chars):
        c = _POOL[rng.integers(0, len(_POOL))]
        try:
            c.encode(py)
        except UnicodeEncodeError:
            continue
        chars.append(c)
    return "".join(chars)


@pytest.mark.parametrize("enc,py", MB_PAIRS)
def test_multibyte_valid_stream_segmentation(enc, py):
    """Event positions/lengths/codepoints over Python-encoded text."""
    rng = np.random.default_rng(hash(enc) % 2**32)
    total = 0
    for _trial in range(20):
        text = _random_text(rng, py, 250)
        data = text.encode(py)
        ev = generate_events(np.frombuffer(data, np.uint8), enc)
        exp = []
        pos = 0
        for c in text:
            n = len(c.encode(py))
            exp.append((pos, n, ord(c)))
            pos += n
        got = [(int(ev.pos[k]), int(ev.in_len[k]), int(ev.cp[k]))
               for k in range(len(ev)) if ev.in_len[k] > 0]
        assert got == exp, f"{enc} trial {_trial}"
        total += len(exp)
    # the sample actually exercised the pools (codecs that cannot
    # encode hangul/cyrillic keep fewer of the drawn chars)
    assert total > 2000


_TRUNC_REASONS = ("unexpected end of data", "incomplete multibyte")


@pytest.mark.parametrize("enc,py", MB_PAIRS)
def test_multibyte_first_error_position(enc, py):
    """Structural junk injected into valid streams: the first error
    byte offset must agree. Shift_JIS corrupts pair TRAILS to an ASCII
    byte (cp932 maps the natural junk singles into the PUA); every
    other pair inserts/overwrites 0xFF, which both lineages reject."""
    rng = np.random.default_rng(hash(py) % 2**32)
    checked = 0
    for _trial in range(200):
        text = _random_text(rng, py, 40)
        data = bytearray(text.encode(py))
        if len(data) < 4:
            continue
        if enc == "Shift_JIS":
            # corrupt the trail of a random multi-byte char
            spans, pos = [], 0
            for c in text:
                n = len(c.encode(py))
                if n == 2:
                    spans.append(pos)
                pos += n
            if not spans:
                continue
            data[spans[int(rng.integers(0, len(spans)))] + 1] = 0x20
        else:
            inj = int(rng.integers(0, len(data) - 1))
            if rng.integers(0, 2):
                data.insert(inj, 0xFF)
            else:
                data[inj] = 0xFF
        data = bytes(data)
        try:
            data.decode(py, "strict")
            py_err, reason = None, ""
        except UnicodeDecodeError as e:
            py_err, reason = e.start, e.reason
        ev = generate_events(np.frombuffer(data, np.uint8), enc)
        our_err = None
        for k in range(len(ev)):
            if ev.cp[k] < 0 and ev.in_len[k] > 0:
                our_err = int(ev.pos[k])
                break
        if our_err is None and py_err is not None and any(
            r in reason for r in _TRUNC_REASONS
        ):
            # whole-buffer decode errors on a truncated TAIL that the
            # streaming decoder holds pending - not a divergence
            continue
        assert py_err == our_err, (
            f"{enc} trial {_trial}: python {py_err} ({reason!r}) vs "
            f"ours {our_err} on {data.hex()}"
        )
        if py_err is not None:
            checked += 1
    assert checked > 40, f"{enc}: too few error cases exercised"


@pytest.mark.parametrize("enc,py", [("gb18030", "gb18030"),
                                    ("GBK", "gbk")])
def test_gb18030_euro_0x80_divergence(enc, py):
    """Documented deliberate divergence (header): bare 0x80 is a
    1-byte U+20AC char per WHATWG gb18030 step 7; CPython errors."""
    ev = generate_events(np.frombuffer(b"A\x80B", np.uint8), enc)
    got = [(int(ev.pos[k]), int(ev.in_len[k]), int(ev.cp[k]))
           for k in range(len(ev))]
    assert got == [(0, 1, 0x41), (1, 1, 0x20AC), (2, 1, 0x42)]
    with pytest.raises(UnicodeDecodeError):
        b"\x80".decode(py)
