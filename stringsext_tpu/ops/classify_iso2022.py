"""Device classification lanes for modal ISO-2022-JP (WHATWG 12.2).

jnp port of engine/events_iso2022.py (the numpy host generator - the
replacement for encoding_rs's only stateful-modal decoder, the piece
SURVEY.md ranks hard part 3: "stateful/modal encodings don't
parallelize by halo self-synchronization; need speculative dual-state
scan"). The decomposition used here is the speculative-multi-mode scan:

  1. Escape recognition is PURELY LOCAL: every 0x1B position starts an
     escape attempt (valid escapes never contain 0x1B, and an invalid
     attempt pushes its tail bytes back so the stream resumes right
     after the ESC), so valid/invalid/truncated escapes are elementwise
     predicates over (b[i], b[i+1], b[i+2]).
  2. The mode at every byte is a PREFIX COMPOSITION of mode-transfer
     functions - the monoid {identity, const_mode} - resolved with one
     jax.lax.associative_scan (the same algebra
     engine.align._iso_mode_transfer composes across shards).
  3. Per-byte event classification given the mode is elementwise
     (ASCII/Roman/Katakana are 1-byte maps; jis0208 pairs are a
     256x256 gather), and the true event chain (pair parity in LEAD
     mode is not self-synchronizing) is the orbit of position 0 under
     i -> i + step[i], the same O(log n) pointer-doubling used for the
     CJK kinds (ops/classify_cjk._orbit_mask).

These lanes power the ISO-2022-JP run-table feed
(ops/device_events.runtable_feed), completing KERNELS.md design 1 for
the last remaining kind: the emitter consumes exact accepted-char runs
plus the device-decoded payload instead of re-walking the modal
decode (/root/reference/src/finding_collection.rs:84-342's loop).

Semantics mirrored from the host generator (events_iso2022.generate),
which is golden/fuzz-pinned against the reference:
  - invalid escapes error at the ESC with pushback 1 (bad e1) or 2
    (bad e2); the pushed-back bytes re-decode as data in the UNCHANGED
    mode (mode changes only on valid escapes);
  - the redundant-escape "output flag" error (two valid escapes with
    no consumed data byte between them) is a second prefix scan over
    the {set, clear, identity} flag monoid;
  - a LEAD-mode byte left in trail state when an escape follows is a
    1-byte error reported at the escape; at the true stream end it
    stays pending;
  - truncated escapes at the stream end (ESC / ESC $ / ESC () produce
    no events (pending).

`state_hot` marks every byte whose class is mode- or phase-dependent
(escape spans + all LEAD-mode data): the feed-derived hot map must keep
these hot so the emitter's cold-window skipper (which requires skipped
bytes to be mode-and-phase-neutral 1-byte events) stays sound.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..encodings import KIND_EUC_JP
from .classify import Lanes, _shift_left
from .classify_cjk import _orbit_mask, _pair_cp_np

# Modes (events_iso2022.py): 0 ASCII, 1 Roman, 2 Katakana, 3 jis0208.
_SET_MODE = {0x42: 0, 0x4A: 1, 0x49: 2}  # after ESC ( ; ESC $ @/B -> 3


def _shift_right(x, k, fill):
    """x[i-k] with `fill` before the start (lookback)."""
    pad = jnp.full((k,), fill, x.dtype)
    return jnp.concatenate([pad, x[:-k]])[: x.shape[0]]


def _scan_last_set(tval: jax.Array) -> jax.Array:
    """Inclusive prefix composition of {identity=-1, const=v>=0}:
    out[i] = last non-negative tval[j] with j <= i, else -1."""
    return jax.lax.associative_scan(
        lambda a, b: jnp.where(b >= 0, b, a), tval
    )


def _iso_escapes(b, n):
    """Local escape recognition over a chunk (shared by the core and
    the shard state-transfer). Returns a dict of per-byte masks."""
    cap = b.shape[0]
    idx = jnp.arange(cap, dtype=jnp.int32)
    in_n = idx < n
    have1 = idx < n - 1
    have2 = idx < n - 2
    b1 = _shift_left(b, 1, 0)
    b2 = _shift_left(b, 2, 0)

    esc = (b == 0x1B) & in_n
    e1_28 = b1 == 0x28
    e1_24 = b1 == 0x24
    set28 = (b2 == 0x42) | (b2 == 0x4A) | (b2 == 0x49)
    set24 = (b2 == 0x40) | (b2 == 0x42)
    valid_esc = esc & have2 & ((e1_28 & set28) | (e1_24 & set24))
    esc_mode = jnp.where(b2 == 0x4A, 1, jnp.where(b2 == 0x49, 2, 0))
    esc_mode = jnp.where(e1_24, 3, esc_mode)
    trunc_esc = esc & (~have1 | ((e1_28 | e1_24) & have1 & ~have2))
    invalid_esc = esc & ~valid_esc & ~trunc_esc
    esc_body = (valid_esc | _shift_right(valid_esc, 1, False)
                | _shift_right(valid_esc, 2, False))
    trunc_span = trunc_esc | _shift_right(trunc_esc, 1, False)
    data = in_n & ~esc_body & ~invalid_esc & ~trunc_span
    return dict(
        esc=esc, e1_28=e1_28, e1_24=e1_24, valid_esc=valid_esc,
        esc_mode=esc_mode, trunc_esc=trunc_esc, invalid_esc=invalid_esc,
        esc_body=esc_body, trunc_span=trunc_span, data=data,
        b1=b1, in_n=in_n, have1=have1, have2=have2, idx=idx,
    )


def iso_state_transfer(b: jax.Array, n, lo: int, hi: int) -> jax.Array:
    """int32[2] = (mode_t, flag_t): the shard's transfer values over
    EFFECT positions in [lo, hi) - the mode set by the last valid
    escape whose effect (ESC+3) lands in the span, and the last
    redundant-escape flag event (valid-escape end sets 1, a consumed
    data byte clears to 0); -1 = identity. Effect positions partition
    the stream across shards (each belongs to exactly one owned span),
    so composing these left-to-right from (mode 0, flag unset) yields
    every shard's entry state (the device analog of
    engine.align._iso_mode_transfer / _compose_entry_mode)."""
    b = b.astype(jnp.int32)
    n = jnp.asarray(n, jnp.int32)
    E = _iso_escapes(b, n)
    idx = E["idx"]
    own = (idx >= lo) & (idx < hi)

    def last_val(v):
        v = jnp.where(own, v, -1)
        li = jnp.max(jnp.where(v >= 0, idx, -1))
        return jnp.where(
            li >= 0, jnp.take(v, jnp.clip(li, 0, b.shape[0] - 1)), -1
        )

    tval = _shift_right(jnp.where(E["valid_esc"], E["esc_mode"], -1), 3, -1)
    fv = jnp.where(E["data"], 0, -1)
    fv = jnp.where(_shift_right(E["valid_esc"], 2, False), 1, fv)
    return jnp.stack([last_val(tval), last_val(fv)]).astype(jnp.int32)


def iso_pre_lanes(b: jax.Array, n, entry_mode=0, entry_flag=-1,
                  effect_lo: int = 0):
    """Orbit-FREE ISO-2022-JP lanes + step array + state_hot, decoded
    from entry state (entry_mode, entry_flag) with mode/flag effects
    before `effect_lo` masked out (they are summarized by the entry
    state - the mesh path composes them across shards with
    iso_state_transfer). `lanes & orbit` reproduces iso2022_lanes;
    entry (0, -1) with effect_lo 0 is the whole-stream decode."""
    b = b.astype(jnp.int32)
    cap = b.shape[0]
    if n is None:
        n = cap
    n = jnp.asarray(n, jnp.int32)
    E = _iso_escapes(b, n)
    idx = E["idx"]
    have1 = E["have1"]
    b1 = E["b1"]
    valid_esc = E["valid_esc"]
    trunc_esc = E["trunc_esc"]
    invalid_esc = E["invalid_esc"]
    data = E["data"]
    inv_far = invalid_esc & (E["e1_28"] | E["e1_24"])  # bad e2: pushback 2
    inv_near = invalid_esc & ~(E["e1_28"] | E["e1_24"])  # bad e1: pushback 1

    # --- mode prefix composition -------------------------------------
    # A valid escape at i sets the mode from position i+3 on. Effects
    # before effect_lo are already folded into entry_mode.
    tval = _shift_right(jnp.where(valid_esc, E["esc_mode"], -1), 3, -1)
    tval = jnp.where(idx >= effect_lo, tval, -1)
    mpfx = _scan_last_set(tval)
    mode = jnp.where(mpfx >= 0, mpfx, entry_mode)

    # --- LEAD (jis0208 two-byte) segments ----------------------------
    lead_data = data & (mode == 3)
    in_range = (b >= 0x21) & (b <= 0x7E)
    next_is_data = _shift_left(data, 1, False)
    pair = lead_data & in_range & next_is_data
    dangle = lead_data & in_range & have1 & ~next_is_data  # ESC follows
    pend_lead = lead_data & in_range & ~have1  # stream end: pending
    t_in = (b1 >= 0x21) & (b1 <= 0x7E)
    pair_tbl = jnp.asarray(_pair_cp_np(KIND_EUC_JP))
    pcp = jnp.take(pair_tbl.reshape(-1), (b | 0x80) * 256 + (b1 | 0x80))
    pair_cp = jnp.where(t_in & (pcp >= 0), pcp, -1)

    # --- event chain steps (the orbit itself is the caller's) --------
    step = jnp.ones(cap, jnp.int32)
    step = jnp.where(valid_esc, 3, step)
    step = jnp.where(pair, 2, step)
    claim_rest = trunc_esc | pend_lead
    step = jnp.where(claim_rest, jnp.maximum(n - idx, 1), step)

    # --- redundant-escape flag (output flag) scan --------------------
    # {identity=-1, clear=0, set=1}: any consumed data byte clears; a
    # valid escape sets at its END (i+2), so escapes strictly after it
    # see the flag. Escape-error bytes are identity (host parity).
    # Effects before effect_lo are folded into entry_flag.
    fv = jnp.where(data, 0, -1)
    fv = jnp.where(_shift_right(valid_esc, 2, False), 1, fv)
    fv = jnp.where(idx >= effect_lo, fv, -1)
    fpfx = _scan_last_set(fv)
    fp = _shift_right(fpfx, 1, -1)
    flag_before = jnp.where(fp >= 0, fp, entry_flag) == 1
    redundant = valid_esc & flag_before

    # --- event lanes -------------------------------------------------
    ok_ar = (b < 0x80) & (b != 0x0E) & (b != 0x0F)
    cp_roman = jnp.where(b == 0x5C, 0x00A5,
                         jnp.where(b == 0x7E, 0x203E, b))
    ok_kata = (b >= 0x21) & (b <= 0x5F)

    cp = jnp.full(cap, -1, jnp.int32)
    cp = jnp.where(data & (mode == 0) & ok_ar, b, cp)
    cp = jnp.where(data & (mode == 1) & ok_ar, cp_roman, cp)
    cp = jnp.where(data & (mode == 2) & ok_kata, 0xFF61 - 0x21 + b, cp)
    cp = jnp.where(pair, pair_cp, cp)

    length = jnp.ones(cap, jnp.int32)
    length = jnp.where(pair, 2, length)
    length = jnp.where(redundant, 3, length)

    report_off = jnp.zeros(cap, jnp.int32)
    report_off = jnp.where(pair | dangle | inv_near, 1, report_off)
    report_off = jnp.where(inv_far | redundant, 2, report_off)

    pushback = jnp.zeros(cap, jnp.int32)
    pushback = jnp.where(inv_near, 1, pushback)
    pushback = jnp.where(inv_far, 2, pushback)

    is_event = data | invalid_esc | redundant | dangle
    pre_start = is_event & ~claim_rest

    lanes = Lanes(
        start=pre_start,
        valid=pre_start & (cp >= 0),
        length=length,
        cp=jnp.where(pre_start, cp, -1),
        report_off=report_off,
        pushback=pushback,
        pending=claim_rest,
    )
    state_hot = (E["esc_body"] | invalid_esc | E["trunc_span"]
                 | lead_data) & E["in_n"]
    return lanes, step, state_hot


@jax.jit
def iso2022_lanes(b: jax.Array, n: jax.Array | None = None):
    """Per-byte event lanes for an ISO-2022-JP chunk decoded from mode
    ASCII at offset 0 (the buffered whole-stream path; `b` may be
    padded, `n` is the real length). Returns (Lanes, state_hot) where
    state_hot marks mode/phase-dependent bytes (see module docstring).

    Like the CJK lanes, `start` is the resolved event chain (orbit of
    0); non-start positions carry no meaning. Valid escapes that are
    not redundant-escape errors produce NO event (start=False there);
    truncated escapes / dangling leads at the stream end are pending.
    """
    cap = b.shape[0]
    if n is None:
        n = cap
    n = jnp.asarray(n, jnp.int32)
    pre, step, state_hot = iso_pre_lanes(b, n)
    orbit = _orbit_mask(step, n)
    start = pre.start & orbit
    lanes = pre._replace(
        start=start,
        valid=pre.valid & orbit,
        cp=jnp.where(start, pre.cp, -1),
        pending=pre.pending & orbit,
    )
    return lanes, state_hot


def iso2022_state_hot_np(data: np.ndarray) -> np.ndarray:
    """numpy twin of the device `state_hot` mask (jax-free, for the
    host feed builder the ASan fuzz drives): escape spans + all
    LEAD-mode data bytes. Mirrors iso2022_lanes' formulas exactly."""
    b = np.asarray(data, np.uint8).astype(np.int32)
    n = len(b)
    if n == 0:
        return np.zeros(0, bool)
    b1 = np.concatenate([b[1:], [0]])
    b2 = np.concatenate([b[2:], [0, 0]])
    idx = np.arange(n)
    have1 = idx < n - 1
    have2 = idx < n - 2

    esc = b == 0x1B
    e1_28 = b1 == 0x28
    e1_24 = b1 == 0x24
    set28 = (b2 == 0x42) | (b2 == 0x4A) | (b2 == 0x49)
    set24 = (b2 == 0x40) | (b2 == 0x42)
    valid_esc = esc & have2 & ((e1_28 & set28) | (e1_24 & set24))
    esc_mode = np.where(b2 == 0x4A, 1, np.where(b2 == 0x49, 2, 0))
    esc_mode = np.where(e1_24, 3, esc_mode)
    trunc_esc = esc & (~have1 | ((e1_28 | e1_24) & have1 & ~have2))
    invalid_esc = esc & ~valid_esc & ~trunc_esc

    def shift_right(x, k, fill):
        out = np.full(n, fill, x.dtype)
        out[k:] = x[: n - k]
        return out

    tval = shift_right(np.where(valid_esc, esc_mode, -1), 3, -1)
    last = np.maximum.accumulate(np.where(tval >= 0, idx, -1))
    mode = np.where(last >= 0, tval[np.maximum(last, 0)], 0)

    esc_body = (valid_esc | shift_right(valid_esc, 1, False)
                | shift_right(valid_esc, 2, False))
    trunc_span = trunc_esc | shift_right(trunc_esc, 1, False)
    data_pos = ~esc_body & ~invalid_esc & ~trunc_span
    return esc_body | invalid_esc | trunc_span | (data_pos & (mode == 3))
