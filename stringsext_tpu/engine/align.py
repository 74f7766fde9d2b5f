"""Shard/segment boundary alignment proofs - JAX-FREE.

The pure-byte predicates every boundary consumer shares: the CJK
ground-byte decode-forward alignment proof and the ISO-2022-JP
mode-transfer monoid. Used by the host probe/segment splitters
(run.py, which must never import jax on the default path) and by the
distributed shard-boundary search (parallel/distributed.py, which
re-exports them - all consumers must agree on boundaries
deterministically).
"""

from __future__ import annotations

import numpy as np

_ALIGN_LOOKBACK = 4096  # CJK ground-byte lookback (emitter align_cursor)

_CJK_GROUND = {
    "euc-kr": 0x41,
    "big5": 0x40,
    "shift_jis": 0x40,
    "euc-jp": 0x80,
    "gb18030": 0x30,
}


def _cjk_boundary_aligned(win: np.ndarray, w_lo: int, p: int,
                          kind: str) -> bool:
    """True iff, in the global decode, an event starts exactly at
    stream offset p and every earlier event both ends and reports
    before p - proved by decoding forward from the last ground byte
    within the lookback window (decode from a ground byte is
    deterministic and equals the global decode, because a ground byte
    can never be spanned; emitter.cpp align_cursor uses the same
    argument for hot-range skip resumption)."""
    from ..engine import events_cjk

    lim = _CJK_GROUND[kind]
    rel_p = p - w_lo
    lo = max(0, rel_p - _ALIGN_LOOKBACK)
    seg = win[lo:rel_p]
    gi = np.flatnonzero(seg < lim)
    if len(gi) == 0:
        return False
    g = lo + int(gi[-1])
    ev = events_cjk.generate(win[g : min(len(win), rel_p + 64)], kind)
    rp = rel_p - g
    pos = np.asarray(ev.pos)
    if not (pos == rp).any() and rp != 0:
        return False
    before = pos < rp
    if (pos[before] + np.asarray(ev.in_len)[before] > rp).any():
        return False  # an event spans p
    if (np.asarray(ev.report)[before] >= rp).any():
        return False  # an earlier event's label lands in the next shard
    return True


def _iso_mode_transfer(data: np.ndarray) -> int:
    """Mode transfer of a byte span: the mode set by its LAST valid
    escape sequence, or -1 (identity - no valid escape). Pure in the
    bytes: every 0x1B starts escape processing in every decoder mode
    (an ESC is never consumed as pair trail or data), and escape
    validity depends only on the two following bytes
    (engine/events_iso2022.py:177-204)."""
    esc = np.flatnonzero(data == 0x1B)
    if len(esc) == 0:
        return -1
    esc = esc[esc + 2 < len(data)]
    if len(esc) == 0:
        return -1
    b1 = data[esc + 1]
    b2 = data[esc + 2]
    valid = ((b1 == 0x28) & ((b2 == 0x42) | (b2 == 0x4A) | (b2 == 0x49))) | (
        (b1 == 0x24) & ((b2 == 0x40) | (b2 == 0x42))
    )
    ve = esc[valid]
    if len(ve) == 0:
        return -1
    k = int(ve[-1])
    if int(data[k + 1]) == 0x24:
        return 3  # jis0208 lead
    return {0x42: 0, 0x4A: 1, 0x49: 2}[int(data[k + 2])]


def _compose_entry_mode(transfers, upto: int) -> int:
    """Entry mode of shard `upto`: fold the per-shard transfers of
    shards 0..upto-1 over the initial ASCII mode."""
    mode = 0
    for t in transfers[:upto]:
        if t >= 0:
            mode = int(t)
    return mode
