"""Decode-event generation for ISO-2022-JP (WHATWG 12.2).

ISO-2022-JP is modal (escape sequences switch between ASCII / Roman /
half-width-katakana / JIS X 0208 two-byte modes), so unlike the other
encodings its events cannot be computed position-independently. The
escape bytes (0x1B) are rare, so the stream is split at them and each
inter-escape segment is decoded vectorized for its mode; only the
escape transitions themselves are handled sequentially.

Mode semantics and the redundant-escape "output flag" error follow the
WHATWG decoder (what encoding_rs implements).
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..encodings import KIND_EUC_JP
from .events import Events
from .events_cjk import _pair_table

# Modes (the decoder's "output state").
ASCII = 0
ROMAN = 1
KATAKANA = 2
LEAD = 3  # JIS X 0208 two-byte mode


class _Acc:
    def __init__(self):
        self.pos: List[int] = []
        self.in_len: List[int] = []
        self.cp: List[int] = []
        self.report: List[int] = []
        self.pushback: List[int] = []

    def add(self, pos, in_len, cp, report, pushback=0):
        self.pos.append(pos)
        self.in_len.append(in_len)
        self.cp.append(cp)
        self.report.append(report)
        self.pushback.append(pushback)

    def add_many(self, pos, in_len, cp, report):
        self.pos.extend(pos.tolist())
        self.in_len.extend(in_len.tolist())
        self.cp.extend(cp.tolist())
        self.report.extend(report.tolist())
        self.pushback.extend([0] * len(pos))


def _decode_segment(acc: _Acc, b: np.ndarray, start: int, end: int, mode: int) -> bool:
    """Decode b[start:end] (no 0x1B inside) in `mode`; events carry
    absolute positions. Returns True if any char was emitted (clears the
    output flag)."""
    if end <= start:
        return False
    seg = b[start:end]
    idx = np.arange(start, end, dtype=np.int64)
    emitted = False

    if mode in (ASCII, ROMAN):
        ok = (seg < 0x80) & (seg != 0x0E) & (seg != 0x0F)
        cp = seg.astype(np.int32)
        if mode == ROMAN:
            cp = np.where(seg == 0x5C, 0x00A5, cp)
            cp = np.where(seg == 0x7E, 0x203E, cp)
        cp = np.where(ok, cp, -1)
        acc.add_many(idx, np.ones(len(seg), np.int32), cp, idx)
        emitted = bool(ok.any())
    elif mode == KATAKANA:
        ok = (seg >= 0x21) & (seg <= 0x5F)
        cp = np.where(ok, 0xFF61 - 0x21 + seg, -1).astype(np.int32)
        acc.add_many(idx, np.ones(len(seg), np.int32), cp, idx)
        emitted = bool(ok.any())
    else:  # LEAD: two-byte jis0208 pairs
        n = len(seg)
        valid08, _ = _pair_table(KIND_EUC_JP)
        i = 0
        # Pairs at even offsets within the segment (errors consume the
        # same bytes as chars, so parity is static).
        lead_idx = np.arange(0, n - 1, 2)
        if len(lead_idx):
            l = seg[lead_idx]
            t = seg[lead_idx + 1]
            l_ok = (l >= 0x21) & (l <= 0x7E)
            t_ok = (t >= 0x21) & (t <= 0x7E)
            pair_ok = l_ok & t_ok & valid08[(l | 0x80), (t | 0x80)]
            # Batch-decode valid pairs via the equivalent EUC-JP bytes.
            cp = np.full(len(lead_idx), -1, dtype=np.int32)
            vi = np.flatnonzero(pair_ok)
            if len(vi):
                eb = np.empty((len(vi), 2), dtype=np.uint8)
                eb[:, 0] = (l[vi] | 0x80).astype(np.uint8)
                eb[:, 1] = (t[vi] | 0x80).astype(np.uint8)
                decoded = eb.tobytes().decode("euc_jp")
                cp[vi] = np.frombuffer(
                    decoded.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int32)
                emitted = True
            # Bad lead byte: 1-byte error; the trail byte is then
            # treated as a fresh lead, shifting parity - handled by
            # falling back to a scalar walk when any lead is bad.
            if not l_ok.all():
                return _decode_lead_scalar(acc, seg, start, valid08) or emitted
            in_len = np.full(len(lead_idx), 2, dtype=np.int32)
            report = idx[lead_idx + 1]
            acc.add_many(idx[lead_idx], in_len, cp, report)
        if n % 2 == 1:
            # Trailing lead byte: stays pending in trail-byte state; the
            # caller decides (escape follows -> error; EOF -> nothing).
            return emitted
        return emitted
    return emitted


def _decode_lead_scalar(acc: _Acc, seg: np.ndarray, start: int, valid08) -> bool:
    """Scalar walk for LEAD-mode segments containing bad lead bytes
    (rare): a bad lead consumes one byte and errors; the next byte
    becomes a lead."""
    emitted = False
    i = 0
    n = len(seg)
    while i < n:
        l = int(seg[i])
        if not (0x21 <= l <= 0x7E):
            acc.add(start + i, 1, -1, start + i)
            i += 1
            continue
        if i + 1 >= n:
            return emitted  # pending trail
        t = int(seg[i + 1])
        if 0x21 <= t <= 0x7E and valid08[l | 0x80, t | 0x80]:
            cp = ord(bytes([l | 0x80, t | 0x80]).decode("euc_jp"))
            acc.add(start + i, 2, cp, start + i + 1)
            emitted = True
        else:
            acc.add(start + i, 2, -1, start + i + 1)
        i += 2
    return emitted


def generate(data: np.ndarray) -> Events:
    n = len(data)
    b = data.astype(np.int32)
    acc = _Acc()
    esc_positions = np.flatnonzero(b == 0x1B)

    mode = ASCII
    output_flag = False
    pos = 0
    ei = 0
    while pos < n:
        # Find the next escape at or after pos.
        while ei < len(esc_positions) and esc_positions[ei] < pos:
            ei += 1
        esc = int(esc_positions[ei]) if ei < len(esc_positions) else n

        # Decode the segment before the escape in the current mode.
        seg_end = esc
        if mode == LEAD and (seg_end - pos) % 2 == 1 and seg_end < n:
            # Odd-length LEAD segment before an escape: the trailing
            # lead byte is in trail-byte state when 0x1B arrives ->
            # error for the incomplete pair (WHATWG trail byte state).
            if _decode_segment(acc, b, pos, seg_end - 1, LEAD):
                output_flag = False
            acc.add(seg_end - 1, 1, -1, esc)
            pos = seg_end
        else:
            if _decode_segment(acc, b, pos, seg_end, mode):
                output_flag = False

        if esc >= n:
            break
        # Process the escape sequence (sequential; escapes are rare).
        if esc + 1 >= n:
            break  # ESC pending at stream end
        e1 = int(b[esc + 1])
        if e1 not in (0x24, 0x28):
            # Invalid: error covers ESC; e1 is pushed back.
            acc.add(esc, 1, -1, esc + 1, pushback=1)
            pos = esc + 1
            continue
        if esc + 2 >= n:
            break  # ESC $ / ESC ( pending at stream end
        e2 = int(b[esc + 2])
        new_mode = None
        if e1 == 0x28:
            new_mode = {0x42: ASCII, 0x4A: ROMAN, 0x49: KATAKANA}.get(e2)
        else:  # 0x24
            new_mode = LEAD if e2 in (0x40, 0x42) else None
        if new_mode is None:
            # Invalid: error covers ESC; e1,e2 pushed back.
            acc.add(esc, 1, -1, esc + 2, pushback=2)
            pos = esc + 1
            continue
        was = output_flag
        output_flag = True
        mode = new_mode
        pos = esc + 3
        if was:
            # Redundant escape (no char since the last one): error
            # covering the whole sequence (WHATWG output flag).
            acc.add(esc, 3, -1, esc + 2)

    # Events are appended in true decode order (segments, then escape
    # events, then re-decoded pushback bytes). Reports must be
    # non-decreasing along that order: a pushed-back byte only becomes
    # available at the moment the invalid escape was detected, so clamp
    # each report to the running maximum (matching the sequential
    # decoder's emission clock).
    ev = Events(acc.pos, acc.in_len, acc.cp, acc.report, acc.pushback)
    ev.report = np.maximum.accumulate(ev.report) if len(ev) else ev.report
    return ev
