#!/usr/bin/env python3
"""Generate the vendored WHATWG Encoding Standard index tables.

The reference (stringsext) delegates all decoding to the encoding_rs
crate, which implements the WHATWG Encoding Standard indexes verbatim
(/root/reference/src/mission.rs:681, scanner.rs:76). This repo has no
network access and no cargo, so the indexes are reconstructed offline
from multiple independent sources and checked in as data
(stringsext_tpu/encodings/whatwg_data.npz):

- Python's codecs (CPython Modules/cjkcodecs + encodings/): primary.
- glibc iconv (a second, independent implementation): arbiter for
  version-skew (HKSCS-2004 vs 2008, GB18030-2000 vs 2005).
- Structural identities of the WHATWG indexes themselves: index
  jis0208 is shared by Shift_JIS / EUC-JP / ISO-2022-JP and equals the
  Windows codepage 932 layout (NEC row 13, NEC-selected IBM rows
  89-92, IBM extension leads 0xFA-0xFC, EUDC leads 0xF0-0xF9).
- A hand-audited override list for the spec's documented deviations
  (each entry carries a `why`).

Every place a source disagrees with the final table is written to
stringsext_tpu/encodings/whatwg_audit.json; tests/test_whatwg_tables.py
pins those diff sets so any regeneration drift fails loudly.

Run: python3 scripts/gen_whatwg_tables.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_NPZ = os.path.join(REPO, "stringsext_tpu", "encodings", "whatwg_data.npz")
OUT_AUDIT = os.path.join(
    REPO, "stringsext_tpu", "encodings", "whatwg_audit.json")

audit: dict = {"sources": {}, "overrides": {}, "diffs": {}}


def iconv_decode_all(charset: str, seqs: list[bytes]) -> list:
    """Decode each byte sequence independently with glibc iconv.
    Returns a list of tuple-of-codepoints or None (undecodable).
    Batched: one subprocess per call group, sequences separated by a
    sentinel that survives every charset (ASCII NUL is unsafe in some
    CJK charsets mid-sequence, so decode one-by-one in chunks via
    per-sequence calls only for mismatch resolution; the bulk path
    relies on self-delimiting single sequences)."""
    out = []
    # Bulk: many single sequences, each its own iconv call would be too
    # slow (hundreds of thousands). Instead decode each sequence with
    # python-level framing: feed all sequences joined by '\n' (0x0A is
    # a hard delimiter in all charsets here: never a valid trail byte
    # and decodes to U+000A). Sequences containing 0x0A never occur in
    # the lead/trail ranges we enumerate.
    CHUNK = 20000
    for i in range(0, len(seqs), CHUNK):
        chunk = seqs[i:i + CHUNK]
        blob = b"\n".join(chunk) + b"\n"
        p = subprocess.run(
            ["iconv", "-f", charset, "-t", "UTF-32LE", "-c"],
            input=blob, capture_output=True)
        text = np.frombuffer(p.stdout, dtype="<u4")
        # split on U+000A
        nl = np.flatnonzero(text == 0x0A)
        prev = 0
        fields = []
        for j in nl.tolist():
            fields.append(tuple(int(c) for c in text[prev:j]))
            prev = j + 1
        # -c drops undecodable sequences entirely -> empty field
        if len(fields) != len(chunk):
            # a sequence contained a newline-producing byte or iconv
            # merged fields; fall back to per-sequence calls
            fields = []
            for s in chunk:
                q = subprocess.run(
                    ["iconv", "-f", charset, "-t", "UTF-32LE"],
                    input=s, capture_output=True)
                if q.returncode != 0 or len(q.stdout) % 4:
                    fields.append(None)
                else:
                    fields.append(tuple(
                        int(c) for c in np.frombuffer(q.stdout, "<u4")))
        out.extend(f if f else None for f in fields)
    return out


def cjk_field(cps):
    """Validity rule for iconv-decoded CJK pair fields: `iconv -c`
    drops error bytes but passes ASCII trail bytes through, so a field
    containing any cp < 0x80 means the sequence did NOT decode as one
    unit (every CJK index value is >= U+0080)."""
    if cps is None or any(c < 0x80 for c in cps):
        return None
    return cps


def py_decode(codec: str, seq: bytes):
    try:
        s = seq.decode(codec)
    except UnicodeDecodeError:
        return None
    return tuple(ord(c) for c in s)


# ---------------------------------------------------------------------------
# Single-byte indexes (WHATWG section 9; 128 entries each, byte-0x80).
# ---------------------------------------------------------------------------

SB_CODECS = {
    "IBM866": "cp866", "ISO-8859-2": "iso8859_2", "ISO-8859-3": "iso8859_3",
    "ISO-8859-4": "iso8859_4", "ISO-8859-5": "iso8859_5",
    "ISO-8859-6": "iso8859_6", "ISO-8859-7": "iso8859_7",
    "ISO-8859-8": "iso8859_8", "ISO-8859-10": "iso8859_10",
    "ISO-8859-13": "iso8859_13", "ISO-8859-14": "iso8859_14",
    "ISO-8859-15": "iso8859_15", "ISO-8859-16": "iso8859_16",
    "KOI8-R": "koi8_r", "KOI8-U": "koi8_u", "macintosh": "mac_roman",
    "windows-874": "cp874", "windows-1250": "cp1250",
    "windows-1251": "cp1251", "windows-1252": "cp1252",
    "windows-1253": "cp1253", "windows-1254": "cp1254",
    "windows-1255": "cp1255", "windows-1256": "cp1256",
    "windows-1257": "cp1257", "windows-1258": "cp1258",
    "x-mac-cyrillic": "mac_cyrillic",
}

# Windows codepages (and windows-874): WHATWG fills every hole in
# 0x80-0x9F with the C1 control of the same value (visible in the
# published indexes: index-windows-1252 begins 8364,129,8218,... —
# 129 = U+0081). ISO-8859-* holes stay holes.
C1_FILL = {
    "windows-874", "windows-1250", "windows-1251", "windows-1252",
    "windows-1253", "windows-1254", "windows-1255", "windows-1256",
    "windows-1257", "windows-1258",
}

# Hand-audited spec-level overrides (byte -> codepoint), each with a
# documented reason recorded in the audit file.
SB_OVERRIDES = {
    "KOI8-U": {
        0xAE: (0x045E, "WHATWG index koi8-u is the KOI8-RU variant: "
                        "0xAE is CYRILLIC SMALL LETTER SHORT U"),
        0xBE: (0x040E, "KOI8-RU: 0xBE is CYRILLIC CAPITAL LETTER SHORT U"),
    },
    "windows-1255": {
        0xCA: (0x05BA, "index windows-1255 defines 0xCA as HEBREW POINT "
                        "HOLAM HASER FOR VAV; cp1255 leaves a hole"),
    },
    "macintosh": {
        0xBD: (0x2126, "index macintosh follows Apple ROMAN.TXT: 0xBD is "
                        "U+2126 OHM SIGN (Python/glibc use U+03A9)"),
    },
}


# glibc iconv charset names for the second-source arbitration of every
# single-byte table (ISO-8859-8-I shares the ISO-8859-8 index and is a
# copy, not separately arbitrated).
SB_ICONV = {
    "IBM866": "IBM866", "ISO-8859-2": "ISO-8859-2",
    "ISO-8859-3": "ISO-8859-3", "ISO-8859-4": "ISO-8859-4",
    "ISO-8859-5": "ISO-8859-5", "ISO-8859-6": "ISO-8859-6",
    "ISO-8859-7": "ISO-8859-7", "ISO-8859-8": "ISO-8859-8",
    "ISO-8859-10": "ISO-8859-10", "ISO-8859-13": "ISO-8859-13",
    "ISO-8859-14": "ISO-8859-14", "ISO-8859-15": "ISO-8859-15",
    "ISO-8859-16": "ISO-8859-16", "KOI8-R": "KOI8-R", "KOI8-U": "KOI8-U",
    "macintosh": "MACINTOSH", "windows-874": "CP874",
    "windows-1250": "CP1250", "windows-1251": "CP1251",
    "windows-1252": "CP1252", "windows-1253": "CP1253",
    "windows-1254": "CP1254", "windows-1255": "CP1255",
    "windows-1256": "CP1256", "windows-1257": "CP1257",
    "windows-1258": "CP1258", "x-mac-cyrillic": "MAC-CYRILLIC",
}

# Audited places where GLIBC departs from the WHATWG index while
# Python agrees with it (the mirror of SB_OVERRIDES, where BOTH depart
# and the index value is installed by hand). Any OTHER glibc
# divergence aborts the generation for manual audit.
GLIBC_VARIANT_OK = {
    "macintosh": {
        0xC6: "Apple ROMAN.TXT and index macintosh: U+2206 INCREMENT; "
              "glibc maps GREEK CAPITAL DELTA",
        0xF0: "Apple ROMAN.TXT and index macintosh: U+F8FF Apple logo "
              "PUA; glibc maps U+E01E",
    },
    "x-mac-cyrillic": {
        0xFF: "Apple CYRILLIC.TXT rev >= mac OS 9 and index "
              "x-mac-cyrillic: U+20AC EURO SIGN; glibc keeps the older "
              "U+00A4 CURRENCY SIGN",
    },
}


def iconv_strict(charset: str, seq: bytes):
    """Per-sequence strict decode (no -c): None when glibc rejects any
    part of the sequence - distinguishes a REAL glibc mapping from the
    bulk path's -c artifact (error bytes dropped, remainder re-decoded,
    e.g. 0x8F dropped from an invalid EUC-JP jis0212 triple and the
    trailing pair re-read as a jis0208 char)."""
    q = subprocess.run(
        ["iconv", "-f", charset, "-t", "UTF-32LE"],
        input=seq, capture_output=True)
    if q.returncode != 0 or len(q.stdout) % 4:
        return None
    return tuple(int(c) for c in np.frombuffer(q.stdout, "<u4"))


def arbitrate_single_byte(tables):
    """Second-source every single-byte table against glibc iconv.
    Every divergence must be one of: the WHATWG C1-control fill (glibc
    leaves the hole), a documented SB_OVERRIDES entry (both Python and
    glibc depart from the index), or a documented GLIBC_VARIANT_OK
    entry (glibc alone departs). Anything else aborts."""
    seqs = [bytes([b]) for b in range(0x80, 0x100)]
    for name, charset in SB_ICONV.items():
        t = tables[name]
        g = iconv_decode_all(charset, seqs)
        entries = []
        for b, gv in zip(range(0x80, 0x100), g):
            gvv = gv[0] if gv is not None and len(gv) == 1 else None
            cur = int(t[b - 0x80])
            cur = None if cur < 0 else cur
            if gvv == cur:
                continue
            if gvv is None:
                # strict re-check: -c may have eaten a combining form
                sv = iconv_strict(charset, bytes([b]))
                gvv = sv[0] if sv is not None and len(sv) == 1 else None
                if gvv == cur:
                    continue
            if (name in C1_FILL and 0x80 <= b < 0xA0 and cur == b
                    and gvv is None):
                why = "WHATWG C1 control fill; glibc leaves the hole"
            elif b in SB_OVERRIDES.get(name, {}):
                why = ("documented index override (see overrides/" +
                       name + ")")
            elif b in GLIBC_VARIANT_OK.get(name, {}):
                why = GLIBC_VARIANT_OK[name][b]
            else:
                raise AssertionError(
                    f"unaudited glibc divergence: {name} byte {b:#x} "
                    f"table={cur} glibc={gvv} - audit before regenerating")
            entries.append({"byte": b, "table": cur, "glibc": gvv,
                            "why": why})
        audit["diffs"][f"{name}_vs_glibc"] = {
            "charset": charset, "count": len(entries), "entries": entries,
        }


def arbitrate_jis0212(idx):
    """Second-source index jis0212 against glibc's EUC-JP 0x8F triples.
    The bulk -c pass mis-frames invalid triples (0x8F dropped, the
    trailing pair re-decoded as jis0208), so every bulk mismatch is
    re-checked strictly; the strict diff set must be empty."""
    seqs, ptrs = [], []
    for b2 in range(0xA1, 0xFF):
        for b3 in range(0xA1, 0xFF):
            seqs.append(bytes([0x8F, b2, b3]))
            ptrs.append((b2 - 0xA1) * 94 + (b3 - 0xA1))
    # Audited glibc-only departures (every other strict diff aborts).
    variant_ok = {
        116: "JIS X 0212 2-23 (0x8F 0xA2 0xB7): glibc decodes U+FF5E "
             "FULLWIDTH TILDE; FOUR independent sources - Python "
             "euc_jp, euc_jisx0213, iso2022_jp_2 and Tcl's "
             "jis0212.enc (Unicode consortium mapping, the lineage of "
             "WHATWG index jis0212, which has no Windows codepage) - "
             "all say U+007E TILDE; the table keeps U+007E",
    }
    g = iconv_decode_all("EUC-JP", seqs)
    diffs = []
    for s, p, gv in zip(seqs, ptrs, g):
        gvv = gv[0] if gv is not None and len(gv) == 1 and gv[0] >= 0x80 \
            else None
        cur = int(idx[p])
        cur = None if cur < 0 else cur
        if gvv == cur:
            continue
        sv = iconv_strict("EUC-JP", s)
        gvv = sv[0] if sv is not None and len(sv) == 1 else None
        if gvv == cur:
            continue
        if p not in variant_ok:
            raise AssertionError(
                f"unaudited jis0212 glibc divergence: bytes {s.hex()} "
                f"pointer {p} table={cur} glibc={gvv}")
        diffs.append({"bytes": s.hex(), "pointer": p, "table": cur,
                      "glibc": gvv, "why": variant_ok[p]})
    audit["diffs"]["jis0212_vs_glibc"] = {
        "charset": "EUC-JP (0x8F triples, strict re-check)",
        "count": len(diffs), "entries": diffs,
    }


def build_single_byte():
    tables = {}
    for name, codec in SB_CODECS.items():
        t = np.full(128, -1, dtype=np.int32)
        for b in range(0x80, 0x100):
            cp = py_decode(codec, bytes([b]))
            if cp is not None and len(cp) == 1:
                t[b - 0x80] = cp[0]
        diffs = []
        if name in C1_FILL:
            for b in range(0x80, 0xA0):
                if t[b - 0x80] < 0:
                    t[b - 0x80] = b
                    diffs.append({"byte": b, "py": None, "whatwg": b,
                                  "why": "C1 control fill"})
        for b, (cp, why) in SB_OVERRIDES.get(name, {}).items():
            old = int(t[b - 0x80])
            t[b - 0x80] = cp
            diffs.append({"byte": b, "py": old if old >= 0 else None,
                          "whatwg": cp, "why": why})
        if diffs:
            audit["diffs"][name] = diffs
        tables[name] = t
    # ISO-8859-8-I shares the ISO-8859-8 index (WHATWG 9).
    tables["ISO-8859-8-I"] = tables["ISO-8859-8"].copy()
    return tables


# ---------------------------------------------------------------------------
# index jis0208 (WHATWG; shared by Shift_JIS, EUC-JP, ISO-2022-JP).
# Derived from cp932 via the Shift_JIS pointer formula. The index is
# pointer-indexed, size 11280 (lead rows 0x81-0x9F,0xE0-0xFC x 188).
# Pointers 8836-10715 (EUDC leads 0xF0-0xF9) are null in the index;
# the decoder maps them to U+E000+pointer-8836 (WHATWG 13.3.1 step 5).
# ---------------------------------------------------------------------------

def sjis_bytes_for_pointer(p: int):
    lead_idx, trail_idx = divmod(p, 188)
    lead = lead_idx + 0x81 if lead_idx < 0x1F else lead_idx - 0x1F + 0xE0
    trail = trail_idx + 0x40 if trail_idx < 0x3F else trail_idx - 0x3F + 0x80
    return lead, trail


def build_jis0208():
    idx = np.full(11280, -1, dtype=np.int32)
    eudc_mismatch = []
    for p in range(11280):
        lead, trail = sjis_bytes_for_pointer(p)
        cp = py_decode("cp932", bytes([lead, trail]))
        if cp is None or len(cp) != 1:
            continue
        if 8836 <= p <= 10715:
            # EUDC: cp932 maps it; WHATWG computes it. Verify equal,
            # keep the index entry null (decoder formula handles it).
            if cp[0] != 0xE000 + p - 8836:
                eudc_mismatch.append((p, cp[0]))
            continue
        idx[p] = cp[0]
    assert not eudc_mismatch, eudc_mismatch[:5]
    # Structural note: the NEC-selected IBM rows (89-92, pointers
    # 8272-8647) duplicate the IBM extension area (10716+) as a SET
    # (different ordering) per the codepage-932 layout WHATWG adopted.
    nec = {int(v) for v in idx[8272:8648] if v >= 0}
    ibm = {int(v) for v in idx[10716:] if v >= 0}
    audit["sources"]["jis0208"] = {
        "derived_from": "cp932 via Shift_JIS pointer formula",
        "nonnull": int((idx >= 0).sum()),
        "nec_selected_ibm_size": len(nec), "ibm_ext_size": len(ibm),
        "nec_minus_ibm": sorted(nec - ibm), "ibm_minus_nec_count": len(ibm - nec),
    }
    return idx


def build_jis0212():
    # index jis0212 (EUC-JP 0x8F three-byte forms), pointer =
    # (b2-0xA1)*94 + (b3-0xA1). Python's euc_jp implements JIS X 0212.
    idx = np.full(94 * 94, -1, dtype=np.int32)
    for b2 in range(0xA1, 0xFF):
        for b3 in range(0xA1, 0xFF):
            cp = py_decode("euc_jp", bytes([0x8F, b2, b3]))
            if cp is not None and len(cp) == 1:
                idx[(b2 - 0xA1) * 94 + (b3 - 0xA1)] = cp[0]
    audit["sources"]["jis0212"] = {
        "derived_from": "Python euc_jp 0x8F forms",
        "nonnull": int((idx >= 0).sum()),
    }
    return idx


def audit_eucjp_vs_python(jis0208: np.ndarray):
    """Expected diffs: Python euc_jp is strict JIS X 0208 and rejects
    the NEC row 13 / NEC-selected IBM rows that WHATWG's shared index
    jis0208 (cp932 layout) decodes."""
    diffs = []
    for lead in range(0xA1, 0xFF):
        for trail in range(0xA1, 0xFF):
            p = (lead - 0xA1) * 94 + (trail - 0xA1)
            w = int(jis0208[p]) if p < len(jis0208) else -1
            cp = py_decode("euc_jp", bytes([lead, trail]))
            pyv = cp[0] if cp is not None and len(cp) == 1 else -1
            if w != pyv:
                diffs.append({"lead": lead, "trail": trail, "pointer": p,
                              "py_euc_jp": pyv, "whatwg": w})
    rows = sorted({(d["pointer"] // 94) + 1 for d in diffs})
    audit["diffs"]["EUC-JP_vs_python"] = {
        "count": len(diffs),
        "jis_rows": rows,
        "sample": diffs[:10],
        "why": "WHATWG index jis0208 is the cp932 layout (NEC row 13, "
               "NEC-selected IBM rows 89-92); Python euc_jp is strict "
               "JIS X 0208",
    }
    return diffs


def build_euc_kr():
    # index euc-kr: pointer = (lead-0x81)*190 + (trail-0x41); derived
    # from cp949 (the windows-949 superset WHATWG adopted).
    idx = np.full(126 * 190, -1, dtype=np.int32)
    seqs, ptrs = [], []
    for lead in range(0x81, 0xFF):
        for trail in range(0x41, 0xFF):
            seqs.append(bytes([lead, trail]))
            ptrs.append((lead - 0x81) * 190 + (trail - 0x41))
    for s, p in zip(seqs, ptrs):
        cp = py_decode("cp949", s)
        if cp is not None and len(cp) == 1:
            idx[p] = cp[0]
    # Arbiter: glibc CP949.
    g = iconv_decode_all("CP949", seqs)
    gd = []
    for s, p, gc in zip(seqs, ptrs, g):
        gc = cjk_field(gc)
        gv = gc[0] if gc is not None and len(gc) == 1 else -1
        if gv != int(idx[p]):
            gd.append({"bytes": s.hex(), "py_cp949": int(idx[p]),
                       "glibc": gv})
    audit["diffs"]["EUC-KR_py_vs_glibc"] = gd
    audit["sources"]["euc-kr"] = {
        "derived_from": "cp949", "nonnull": int((idx >= 0).sum()),
    }
    return idx


def build_big5():
    # index big5: pointer = (lead-0x81)*157 + (trail-0x40) for trail
    # 0x40-0x7E, or (trail-0x62) for 0xA1-0xFE. Python big5hkscs is
    # HKSCS-2004; glibc BIG5-HKSCS is HKSCS-2008 (what WHATWG's index
    # was generated from), so glibc wins conflicts; the audit records
    # every arbitration.
    size = 126 * 157
    idx = np.full(size, -1, dtype=np.int32)
    multi = {}  # pointer -> (cp1, cp2)
    seqs, ptrs = [], []
    for lead in range(0x81, 0xFF):
        for trail in list(range(0x40, 0x7F)) + list(range(0xA1, 0xFF)):
            off = 0x40 if trail < 0x7F else 0x62
            seqs.append(bytes([lead, trail]))
            ptrs.append((lead - 0x81) * 157 + (trail - off))
    py = [py_decode("big5hkscs", s) for s in seqs]
    gl = [cjk_field(g) for g in iconv_decode_all("BIG5-HKSCS", seqs)]
    arb = []
    for s, p, pv, gv in zip(seqs, ptrs, py, gl):
        pick = gv if gv is not None else None
        if pv != gv:
            arb.append({"bytes": s.hex(), "pointer": p,
                        "py_hkscs2004": list(pv) if pv else None,
                        "glibc_hkscs2008": list(gv) if gv else None})
        if pick is None:
            continue
        if len(pick) == 1:
            idx[p] = pick[0]
        elif len(pick) == 2:
            multi[p] = (int(pick[0]), int(pick[1]))
        # len>2 never occurs in HKSCS
    audit["diffs"]["Big5_py2004_vs_glibc2008"] = {
        "count": len(arb), "sample": arb[:40],
        "resolution": "glibc (HKSCS-2008, the WHATWG source revision)",
    }
    audit["sources"]["big5"] = {
        "derived_from": "glibc BIG5-HKSCS arbitrated against big5hkscs",
        "nonnull": int((idx >= 0).sum()), "multi": len(multi),
    }
    return idx, multi


def build_gb18030():
    # index gb18030 (two-byte): pointer = (lead-0x81)*190 +
    # (trail-0x40 [0x40-0x7E] / trail-0x41 [0x80-0xFE]). Python's codec
    # is GB18030-2000; glibc 2.36 is GB18030-2005 = the WHATWG base.
    idx = np.full(126 * 190, -1, dtype=np.int32)
    seqs, ptrs = [], []
    for lead in range(0x81, 0xFF):
        for trail in [t for t in range(0x40, 0xFF) if t != 0x7F]:
            off = 0x40 if trail < 0x7F else 0x41
            seqs.append(bytes([lead, trail]))
            ptrs.append((lead - 0x81) * 190 + (trail - off))
    py = [py_decode("gb18030", s) for s in seqs]
    gl = [cjk_field(g) for g in iconv_decode_all("GB18030", seqs)]
    arb = []
    for s, p, pv, gv in zip(seqs, ptrs, py, gl):
        gvv = gv[0] if gv is not None and len(gv) == 1 else None
        pyv = pv[0] if pv is not None and len(pv) == 1 else None
        # WHATWG's index gb18030 is BMP-only (encoding_rs stores it as
        # u16): it adopted GB18030-2005's BMP remappings (U+FE10-19,
        # U+9FB4-BB, U+1E3F) but kept the 2000 PUA values for the six
        # code points 2005 moved to CJK Ext B (astral).
        if gvv is not None and gvv != pyv and gvv > 0xFFFF:
            pick = pyv
            reason = "2005 moved to astral; WHATWG keeps 2000 PUA"
        else:
            pick = gvv
            reason = "glibc (GB18030-2005 BMP)"
        if pyv != pick or gvv != pick:
            arb.append({"bytes": s.hex(), "pointer": p, "py_2000": pyv,
                        "glibc_2005": gvv, "whatwg": pick,
                        "resolution": reason})
        if pick is not None:
            idx[p] = pick
    audit["diffs"]["gb18030_py2000_vs_glibc2005"] = {
        "count": len(arb), "sample": arb[:40],
        "resolution": "glibc (GB18030-2005, the WHATWG base edition)",
    }
    # Spec-level override: index gb18030 pointer 6555 (0xA3 0xA0) maps
    # to U+3000 IDEOGRAPHIC SPACE for web compatibility (both codec
    # editions say U+E5E5).
    p6555 = (0xA3 - 0x81) * 190 + (0xA0 - 0x41)
    audit["overrides"]["gb18030"] = [{
        "pointer": p6555, "bytes": "a3a0", "was": int(idx[p6555]),
        "whatwg": 0x3000,
        "why": "encoding spec: index gb18030 pointer 6555 is U+3000 "
               "(web compat), not U+E5E5",
    }]
    idx[p6555] = 0x3000
    audit["sources"]["gb18030"] = {
        "derived_from": "glibc GB18030 (2005) arbitrated against Python "
                        "(2000)",
        "nonnull": int((idx >= 0).sum()),
    }
    return idx


def gb4_bytes(ptr: int) -> bytes:
    b1 = 0x81 + ptr // 12600
    r = ptr % 12600
    b2 = 0x30 + r // 1260
    r %= 1260
    return bytes([b1, b2, 0x81 + r // 10, 0x30 + r % 10])


def build_gb18030_ranges():
    # gb18030-ranges: linear (pointer, codepoint) breakpoints for the
    # four-byte forms. WHATWG kept the GB18030-2000 ranges (fully
    # covering pointers 0..39419) and handles the 2005 U+1E3F
    # relocation as a decoder special case (pointer 7457 -> U+E7C7),
    # so the base enumeration is Python's GB18030-2000 codec; glibc
    # (2005) arbitration is recorded in the audit (its only deltas:
    # pointer 7457 and 18 pointers whose codepoints gained two-byte
    # forms in 2005, which WHATWG still decodes from four bytes).
    seqs = [gb4_bytes(p) for p in range(39420)]
    cps = np.full(39420, -1, dtype=np.int64)
    for p, s in enumerate(seqs):
        pv = py_decode("gb18030", s)
        if pv is not None and len(pv) == 1:
            cps[p] = pv[0]
    assert (cps >= 0).all(), "undecodable 4-byte pointer in BMP segment"
    # Spec special case (WHATWG 11.1.1): pointer 7457 is U+E7C7.
    audit["overrides"]["gb18030-ranges"] = [{
        "pointer": 7457, "was": int(cps[7457]), "whatwg": 0xE7C7,
        "why": "encoding spec: decoder returns U+E7C7 for pointer 7457 "
               "(GB18030-2005 moved U+1E3F to two-byte 0xA8BC)",
    }]
    cps[7457] = 0xE7C7
    # Arbiter: glibc (2005). Expected deltas only at the 2005 one-way
    # relocations.
    gl = iconv_decode_all("GB18030", seqs)
    gd = []
    for p, gv in enumerate(gl):
        gvv = gv[0] if gv is not None and len(gv) == 1 else None
        if gvv != int(cps[p]):
            gd.append({"pointer": p, "whatwg": int(cps[p]), "glibc": gvv})
    audit["diffs"]["gb18030_ranges_vs_glibc"] = gd
    delta = cps - np.arange(39420)
    breaks = np.flatnonzero(np.diff(delta) != 0) + 1
    ptrs = np.concatenate([[0], breaks]).astype(np.int64)
    vals = cps[ptrs].astype(np.int32)
    # Astral segment.
    lo, hi = 189000, 1237575
    glo = iconv_decode_all("GB18030", [gb4_bytes(lo)])[0]
    ghi = iconv_decode_all("GB18030", [gb4_bytes(hi)])[0]
    assert glo == (0x10000,) and ghi == (0x10FFFF,), (glo, ghi)
    import random
    rng = random.Random(0)
    sample = [rng.randrange(lo, hi + 1) for _ in range(200)]
    gs = iconv_decode_all("GB18030", [gb4_bytes(p) for p in sample])
    for p, gv in zip(sample, gs):
        assert gv == (0x10000 + p - lo,), (p, gv)
    ptrs = np.concatenate([ptrs, [lo]])
    vals = np.concatenate([vals, [0x10000]]).astype(np.int32)
    # Cross-check Python(2000): expect exactly the U+1E3F relocation.
    pd = []
    for p in (7456, 7457, 7458, 39419):
        pv = py_decode("gb18030", gb4_bytes(p))
        i = np.searchsorted(ptrs, p, side="right") - 1
        wv = int(vals[i]) + p - int(ptrs[i])
        if pv != (wv,):
            pd.append({"pointer": p, "py_2000": list(pv) if pv else None,
                       "whatwg": wv})
    audit["diffs"]["gb18030_ranges_py_vs_glibc"] = pd
    audit["sources"]["gb18030-ranges"] = {
        "derived_from": "glibc GB18030 exhaustive BMP enumeration + "
                        "linear astral segment",
        "segments": len(ptrs),
    }
    return ptrs, vals


def main():
    sb = build_single_byte()
    arbitrate_single_byte(sb)
    jis0208 = build_jis0208()
    jis0212 = build_jis0212()
    arbitrate_jis0212(jis0212)
    audit_eucjp_vs_python(jis0208)
    euc_kr = build_euc_kr()
    big5, big5_multi = build_big5()
    gb2 = build_gb18030()
    gptrs, gvals = build_gb18030_ranges()

    arrays = {f"sb_{k}": v for k, v in sb.items()}
    arrays.update(
        jis0208=jis0208, jis0212=jis0212, euc_kr=euc_kr, big5=big5,
        big5_multi=np.array(
            [(p, a, b) for p, (a, b) in sorted(big5_multi.items())],
            dtype=np.int32).reshape(-1, 3),
        gb18030=gb2, gb18030_ranges_ptr=gptrs, gb18030_ranges_cp=gvals,
    )
    # Never touch the vendored npz when the content is unchanged (the
    # golden corpus and three engines all decode from it; an audit-only
    # regeneration must not churn the binary).
    unchanged = False
    if os.path.exists(OUT_NPZ):
        old = np.load(OUT_NPZ)
        unchanged = set(old.files) == set(arrays) and all(
            np.array_equal(old[k], arrays[k]) for k in arrays
        )
    if unchanged:
        print(f"{OUT_NPZ} unchanged (content-identical); not rewritten")
    else:
        np.savez_compressed(OUT_NPZ, **arrays)
        print(f"wrote {OUT_NPZ} ({os.path.getsize(OUT_NPZ)} bytes)")
    with open(OUT_AUDIT, "w") as f:
        json.dump(audit, f, indent=1, sort_keys=True)
    print(f"wrote {OUT_AUDIT}")
    for k, v in audit["diffs"].items():
        n = v["count"] if isinstance(v, dict) else len(v)
        print(f"  diff {k}: {n}")


if __name__ == "__main__":
    sys.exit(main())
