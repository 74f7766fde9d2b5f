"""SWAR flagship Pallas kernel: 4 stream bytes per int32 lane element.

The per-byte kernels in pallas_scan.py spend one VPU lane per byte. This
kernel packs 4 bytes per int32 lane (the natural memory layout) and
computes everything with SIMD-within-register bit tricks, processing 4
bytes (UTF-8) / 2 code units (UTF-16) per lane op:

- per-byte range tests run in two 16-bit channels with a carry-guard
  bias (~6 ops per channel for all 4 bytes at once);
- all boolean structure (continuation chains, maximal-subpart lengths,
  claim/start logic) is mask algebra on 0x01-per-byte words;
- AF/UBF filters are decomposed on the host into byte/codepoint
  intervals (the standard filters are 1-3 intervals; arbitrary bitmask
  filters fall back to the per-byte kernels in pallas_scan.py).

Output formats (one int32 word per 4 input bytes):
  UTF-8  word: 4 x 8-bit per-byte fields (pallas_scan bit layout)
  UTF-16 word: unit fields at bits 0-7 (unit 0 = bytes 0-1) and 16-23

Stream order is little-endian: byte 4*(r*128+c)+j is bits 8j..8j+7 of
word (r, c). Same zero-padding caller contract as pallas_scan.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_scan import (
    ACCEPT_BIT,
    GREP_BIT,
    LANE,
    LEN_SHIFT,
    START_BIT,
    VALID_BIT,
    _roll,
)

# Halo in WORD rows. int32 blocks tile at (8, 128), and the kernel only
# needs one word of context each side, so 8 rows (4 KiB) suffice.
HALO_ROWS = 8

L16 = 0x00010001  # per-16-bit-slot one
G16 = 0x01000100  # per-slot carry guard (bit 8 of each slot)
M01 = 0x01010101  # 0x01 per byte
MFF_EVEN = 0x00FF00FF


def _elem_shift(x, k):
    """Shift by one lane ELEMENT (4 bytes) in stream order, k=+1/-1."""
    if k > 0:  # lookahead
        first_up = _roll(x[:, 0:1], -1, 0)
        y2 = _roll(x, -1, 1)
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        return jnp.where(col == LANE - 1, first_up, y2)
    last_down = _roll(x[:, LANE - 1 :], 1, 0)
    y2 = _roll(x, 1, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(col == 0, last_down, y2)


def _lsr(x, k):
    """Logical shift right on int32 (mask off arithmetic sign fill)."""
    return (x >> k) & ((1 << (32 - k)) - 1) if k else x


def _range_mask(w, lo, hi):
    """0x01-per-byte mask: byte in [lo, hi] (constants 0..255).

    16-bit-channel trick: bias each slot with guard bit 8 so the
    subtraction cannot borrow across slots; the guard bit then holds
    the per-slot comparison result.
    """
    xe = w & MFF_EVEN
    xo = _lsr(w, 8) & MFF_EVEN

    def ge(x, c):  # slot value >= c
        return ((x | G16) - c * L16) & G16

    def le(x, c):  # slot value <= c
        return ((c * L16 | G16) - x) & G16

    me = ge(xe, lo) & le(xe, hi) if lo > 0 else le(xe, hi)
    mo = ge(xo, lo) & le(xo, hi) if lo > 0 else le(xo, hi)
    return (_lsr(me, 8) | mo) & M01


def _eq_mask(w, c):
    return _range_mask(w, c, c)


class _Panel:
    """Byte-shift helpers over a (R,128) packed-word panel."""

    def __init__(self, W):
        self.W = W
        self.Wn = _elem_shift(W, +1)
        self.Wp = _elem_shift(W, -1)

    def fwd(self, kb):
        """Panel shifted forward (lookahead) by kb bytes (1..3)."""
        return _lsr(self.W, 8 * kb) | (self.Wn << (32 - 8 * kb))

    def back_mask(self, m, kb):
        """0x01-mask panel shifted back (lookback) by kb bytes."""
        mp = self.back_elem(m)
        return ((m << (8 * kb)) | _lsr(mp, 32 - 8 * kb)) & M01

    def back_elem(self, x):
        """Array shifted back (lookback) by one ELEMENT (4 bytes)."""
        return _elem_shift(x, -1)

    def fwd_elem(self, x):
        return _elem_shift(x, +1)


class _SlabPanel:
    """Byte-shift helpers over (K, m) word slabs whose ROWS are
    independent windows of the stream (zero context outside each row).

    Derived mission fields are only valid at columns [1, m-1); run
    boundary flags derived from those fields are valid at [2, m-2).
    Used by the stage-3 slab re-derivation in ops/runs.py (the
    fixed-capacity gather path of extract_runs_swar_blocks)."""

    def __init__(self, W):
        self.W = W
        z = jnp.zeros_like(W[:, :1])
        self.Wn = jnp.concatenate([W[:, 1:], z], axis=1)
        self.Wp = jnp.concatenate([z, W[:, :-1]], axis=1)

    def fwd(self, kb):
        return _lsr(self.W, 8 * kb) | (self.Wn << (32 - 8 * kb))

    def back_mask(self, m, kb):
        mp = self.back_elem(m)
        return ((m << (8 * kb)) | _lsr(mp, 32 - 8 * kb)) & M01

    def back_elem(self, x):
        return jnp.concatenate([jnp.zeros_like(x[:, :1]), x[:, :-1]], axis=1)

    def fwd_elem(self, x):
        return jnp.concatenate([x[:, 1:], jnp.zeros_like(x[:, :1])], axis=1)


def swar_utf8_panel(P: _Panel, af_iv, ubf_iv, grep_char: int):
    """Packed 4x8-bit UTF-8 mission fields for the panel."""
    W = P.W
    b1 = P.fwd(1)
    b2 = P.fwd(2)
    b3 = P.fwd(3)

    cont = _range_mask(W, 0x80, 0xBF)
    cont1 = _range_mask(b1, 0x80, 0xBF)
    cont2 = _range_mask(b2, 0x80, 0xBF)
    cont3 = _range_mask(b3, 0x80, 0xBF)

    lead1 = _range_mask(W, 0x00, 0x7F)
    lead2 = _range_mask(W, 0xC2, 0xDF)
    lead3 = _range_mask(W, 0xE0, 0xEF)
    lead4 = _range_mask(W, 0xF0, 0xF4)

    e0 = _eq_mask(W, 0xE0)
    ed = _eq_mask(W, 0xED)
    f0 = _eq_mask(W, 0xF0)
    f4 = _eq_mask(W, 0xF4)
    b1_ge_a0 = _range_mask(b1, 0xA0, 0xBF)
    b1_le_9f = _range_mask(b1, 0x80, 0x9F)
    b1_ge_90 = _range_mask(b1, 0x90, 0xBF)
    b1_le_8f = _range_mask(b1, 0x80, 0x8F)

    c1ok3 = cont1 & (~(e0 & (b1_ge_a0 ^ M01)) & ~(ed & (b1_le_9f ^ M01))) & M01
    c1ok4 = cont1 & (~(f0 & (b1_ge_90 ^ M01)) & ~(f4 & (b1_le_8f ^ M01))) & M01

    valid2 = lead2 & cont1
    valid3 = lead3 & c1ok3 & cont2
    valid4 = lead4 & c1ok4 & cont2 & cont3
    ev_valid = lead1 | valid2 | valid3 | valid4

    nc2 = cont2 ^ M01  # ~cont2 as 0x01 mask
    nc3 = cont3 ^ M01
    bad2 = (lead3 & c1ok3 & nc2) | (lead4 & c1ok4 & nc2)
    bad3 = lead4 & c1ok4 & cont2 & nc3

    ge2 = valid2 | valid3 | valid4 | bad2 | bad3  # claim length >= 2
    ge3 = valid3 | valid4 | bad3
    ge4 = valid4

    noncont = cont ^ M01
    claimed = (
        P.back_mask(noncont & ge2, 1)
        | P.back_mask(noncont & ge3, 2)
        | P.back_mask(noncont & ge4, 3)
    )
    is_start = noncont | (cont & (claimed ^ M01))

    passes = jnp.zeros_like(W)
    for lo, hi in af_iv:
        passes = passes | _range_mask(W, lo, hi)
    for lo, hi in ubf_iv:
        passes = passes | _range_mask(W, lo, hi)

    accept = is_start & ev_valid & passes
    grep = accept & _eq_mask(W, grep_char) if grep_char >= 0 else jnp.zeros_like(W)

    # per-byte 3-bit length: 1 + v2 + 2*v3 + 3*v4 + bad2 + 2*bad3
    # (exactly one of v2/v3/v4/bad2/bad3 per byte; max value 4, no
    # cross-byte carries). Zeroed at non-starts via a 0x07-per-start
    # mask (0x01-mask * 7 cannot carry).
    ln = M01 + valid2 + (valid3 << 1) + valid4 + (valid4 << 1) + bad2 + (bad3 << 1)
    len_bits = (ln << LEN_SHIFT) & ((is_start * 0x07) << LEN_SHIFT)

    packed = (
        accept * ACCEPT_BIT
        | len_bits
        | (grep << 4)
        | (is_start << 5)
        | ((is_start & ev_valid) << 6)
    )
    return packed


def swar_utf16_panel(P: _Panel, cp_iv, grep_char: int, be: bool):
    """UTF-16 mission field word: unit0 field at bits 0-7, unit1 at
    bits 16-23 (units are 2 bytes; fields sit at the unit's first
    byte)."""
    W, Wn = P.W, P.Wn

    def unit_lo(x):  # bytes 0-1 as a code unit
        v = x & 0xFFFF
        if be:
            v = ((x & 0xFF) << 8) | (_lsr(x, 8) & 0xFF)
        return v

    def unit_hi(x):  # bytes 2-3
        v = _lsr(x, 16)
        if be:
            v = ((_lsr(x, 16) & 0xFF) << 8) | (_lsr(x, 24) & 0xFF)
        return v

    u0 = unit_lo(W)
    u1 = unit_hi(W)
    u2 = unit_lo(Wn)

    def is_high(u):
        return (u >= 0xD800) & (u <= 0xDBFF)

    def is_low(u):
        return (u >= 0xDC00) & (u <= 0xDFFF)

    h0, h1 = is_high(u0), is_high(u1)
    l0, l1 = is_low(u0), is_low(u1)
    l2 = is_low(u2)

    pair0 = h0 & l1
    pair1 = h1 & l2
    pair1_prev = P.back_elem(pair1.astype(jnp.int32)) != 0
    trail0 = pair1_prev  # previous word's unit1 started a pair into u0
    trail1 = pair0

    def field(u, un, pair, h, l, trail):
        bmp = ~h & ~l
        lone_h = h & ~((un >= 0xDC00) & (un <= 0xDFFF))
        lone_l = l & ~trail
        astral = 0x10000 + ((u & 0x3FF) << 10) + (un & 0x3FF)
        cp = jnp.where(pair, astral, u)
        valid = (bmp | pair) & ~trail
        start = (bmp | pair | lone_h | lone_l) & ~trail
        ln = jnp.where(pair, 4, 2)
        passes = jnp.zeros_like(u) != 0
        for lo, hi in cp_iv:
            passes = passes | ((cp >= lo) & (cp <= hi))
        accept = start & valid & passes
        grep = accept & (cp == grep_char)
        return (
            accept.astype(jnp.int32) * ACCEPT_BIT
            | (jnp.where(start, ln, 0) << LEN_SHIFT)
            | grep.astype(jnp.int32) * GREP_BIT
            | start.astype(jnp.int32) * START_BIT
            | (start & valid).astype(jnp.int32) * VALID_BIT
        )

    f0 = field(u0, u1, pair0, h0, l0, trail0)
    f1 = field(u1, u2, pair1, h1, l1, trail1)
    return f0 | (f1 << 16)


def swar_flags(w, w_prev, w_next):
    """Derive (acc, lf, gf, run_start, run_end) 0x01/byte-field words
    from packed-lane field words, with one word of context each side.
    Works on any array shape (context arrays same shape).

    The run-boundary rules are the word-packed form of the reference's
    run adjacency (chars are 1-4 bytes, so <=4 static byte shifts
    decide whether an accepted char continues a run or starts one)."""

    def lsr(x, k):
        return (x >> k) & ((1 << (32 - k)) - 1) if k else x

    m80 = jnp.int32(0x80808080 - (1 << 32))
    acc = w & M01
    lf = lsr(w, 1) & (7 * M01)
    gf = lsr(w, 4) & M01
    acc_p = w_prev & M01
    lf_p = lsr(w_prev, 1) & (7 * M01)
    acc_n = w_next & M01

    def zero_bytes(y):
        return lsr((y - M01) & ~y & m80, 7)

    cont_prev = jnp.zeros_like(w)
    joins_next = jnp.zeros_like(w)
    for L in (1, 2, 3, 4):
        eL = zero_bytes(lf ^ (L * M01)) & acc
        eL_p = zero_bytes(lf_p ^ (L * M01)) & acc_p
        # byte-slot shift toward higher positions (lookback by L)
        cont_prev |= ((eL << (8 * L)) | lsr(eL_p, 32 - 8 * L)) & M01
        # accept L bytes ahead (lookahead by L)
        acc_fwd = (lsr(acc, 8 * L) | (acc_n << (32 - 8 * L))) & M01
        joins_next |= zero_bytes(lf ^ (L * M01)) & acc_fwd
    run_start = acc & ~cont_prev & M01
    run_end = acc & ~joins_next & M01
    return acc, lf, gf, run_start, run_end


# ---------------------------------------------------------------- kernels


def _flagship_swar_kernel(af_iv, ubf_iv, cp_iv_le, cp_iv_be, greps):
    def kernel(prev_ref, cur_ref, next_ref, out8_ref, outle_ref, outbe_ref):
        W = jnp.concatenate(
            [prev_ref[...], cur_ref[...], next_ref[...]], axis=0
        )
        P = _Panel(W)
        rows = cur_ref.shape[0]
        sl = slice(HALO_ROWS, HALO_ROWS + rows)
        out8_ref[...] = swar_utf8_panel(P, af_iv, ubf_iv, greps[0])[sl, :]
        outle_ref[...] = swar_utf16_panel(P, cp_iv_le, greps[1], False)[sl, :]
        outbe_ref[...] = swar_utf16_panel(P, cp_iv_be, greps[2], True)[sl, :]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("af_iv", "ubf_iv", "cp_iv_le", "cp_iv_be", "greps",
                     "tile_rows", "interpret"),
)
def flagship_swar_lanes(
    words_2d: jax.Array,  # (rows, 128) int32: packed little-endian bytes
    af_iv: tuple,
    ubf_iv: tuple,
    cp_iv_le: tuple,
    cp_iv_be: tuple,
    greps: tuple,
    tile_rows: int = 256,
    interpret: bool = False,
):
    """All three flagship missions in one SWAR pass. Returns
    (utf8_words, utf16le_words, utf16be_words), each (rows,128) int32.

    Interval parameters are tuples-of-tuples (static: the kernel
    specializes per filter shape, which has a handful of variants)."""
    rows = words_2d.shape[0]
    assert words_2d.shape[1] == LANE and rows % tile_rows == 0
    grid = (rows // tile_rows,)

    halo_spec_prev = pl.BlockSpec(
        (HALO_ROWS, LANE),
        lambda i: (jnp.maximum(i * tile_rows - HALO_ROWS, 0) // HALO_ROWS, 0),
        memory_space=pltpu.VMEM,
    )
    halo_spec_next = pl.BlockSpec(
        (HALO_ROWS, LANE),
        lambda i: (
            jnp.minimum((i + 1) * tile_rows, rows - HALO_ROWS) // HALO_ROWS, 0
        ),
        memory_space=pltpu.VMEM,
    )
    tile_spec = pl.BlockSpec((tile_rows, LANE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _flagship_swar_kernel(af_iv, ubf_iv, cp_iv_le, cp_iv_be, greps),
        grid=grid,
        in_specs=[halo_spec_prev, tile_spec, halo_spec_next],
        out_specs=(tile_spec, tile_spec, tile_spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANE), jnp.int32),
            jax.ShapeDtypeStruct((rows, LANE), jnp.int32),
            jax.ShapeDtypeStruct((rows, LANE), jnp.int32),
        ),
        interpret=interpret,
    )(words_2d, words_2d, words_2d)


def _flagship_swar_counts_kernel(af_iv, ubf_iv, cp_iv_le, cp_iv_be, greps):
    def kernel(prev_ref, cur_ref, next_ref, out_ref):
        W = jnp.concatenate(
            [prev_ref[...], cur_ref[...], next_ref[...]], axis=0
        )
        P = _Panel(W)
        rows = cur_ref.shape[0]
        sl = slice(HALO_ROWS, HALO_ROWS + rows)
        fields = (
            swar_utf8_panel(P, af_iv, ubf_iv, greps[0]),
            swar_utf16_panel(P, cp_iv_le, greps[1], False),
            swar_utf16_panel(P, cp_iv_be, greps[2], True),
        )

        def bytesum(x):  # sum of the 4 byte slots (each <= 1 here)
            return _lsr(x * M01, 24)

        cols = []
        for F in fields:
            acc, _lf, gf, rs, re = swar_flags(
                F, P.back_elem(F), P.fwd_elem(F)
            )
            # One row of the word panel = 128 words = 512 bytes = one
            # compaction block, so a lane reduction per interior row
            # gives the per-block counts directly. Counts <= 512 fit
            # 10-bit fields, so three quantities ride one reduce.
            enc = (
                bytesum(rs[sl]) + (bytesum(re[sl]) << 10) + (bytesum(acc[sl]) << 20)
            )
            cols.append(jnp.sum(enc, axis=1))
            cols.append(jnp.sum(bytesum(gf[sl]), axis=1))
        z = jnp.zeros_like(cols[0])
        out_ref[...] = jnp.stack(cols + [z, z], axis=0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("af_iv", "ubf_iv", "cp_iv_le", "cp_iv_be", "greps",
                     "tile_rows", "interpret"),
)
def flagship_swar_counts(
    words_2d: jax.Array,  # (rows, 128) int32: packed little-endian bytes
    af_iv: tuple,
    ubf_iv: tuple,
    cp_iv_le: tuple,
    cp_iv_be: tuple,
    greps: tuple,
    tile_rows: int = 512,
    interpret: bool = False,
):
    """All three flagship missions fused with run-compaction stage 1:
    one SWAR pass computes the mission fields, derives the run-boundary
    flags in-register, and reduces them to per-512-byte-block counts -
    the full-size lane arrays never leave VMEM (vs. flagship_swar_lanes
    + extract_runs_packed4, which round-trips 3x the input through HBM).

    Returns int32[8, rows]: rows 2*m / 2*m+1 are mission m's packed
    block counts (run_start | run_end<<10 | accept<<20) and grep
    counts; rows 6-7 are zero padding. Consumed by
    ops/runs.py:extract_runs_swar_blocks (stages 2-3).

    Same zero-padding caller contract as flagship_swar_lanes. At the
    stream edges the halo wraps (first tile's left context is the
    stream's bytes 4064..4095, symmetrically on the right); the stage-3
    slab re-derivation replicates that wrap so counts and slabs always
    agree."""
    rows = words_2d.shape[0]
    assert words_2d.shape[1] == LANE and rows % tile_rows == 0
    grid = (rows // tile_rows,)

    halo_spec_prev = pl.BlockSpec(
        (HALO_ROWS, LANE),
        lambda i: (jnp.maximum(i * tile_rows - HALO_ROWS, 0) // HALO_ROWS, 0),
        memory_space=pltpu.VMEM,
    )
    halo_spec_next = pl.BlockSpec(
        (HALO_ROWS, LANE),
        lambda i: (
            jnp.minimum((i + 1) * tile_rows, rows - HALO_ROWS) // HALO_ROWS, 0
        ),
        memory_space=pltpu.VMEM,
    )
    tile_spec = pl.BlockSpec((tile_rows, LANE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((8, tile_rows), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _flagship_swar_counts_kernel(af_iv, ubf_iv, cp_iv_le, cp_iv_be, greps),
        grid=grid,
        in_specs=[halo_spec_prev, tile_spec, halo_spec_next],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((8, rows), jnp.int32),
        interpret=interpret,
    )(words_2d, words_2d, words_2d)


# ------------------------------------------------------- host-side helpers


def decompose_intervals(bits: int, nbits: int, base: int = 0) -> List[Tuple[int, int]]:
    """Set bits of a mask -> list of [lo, hi] inclusive intervals."""
    out = []
    i = 0
    while i < nbits:
        if (bits >> i) & 1:
            j = i
            while j + 1 < nbits and (bits >> (j + 1)) & 1:
                j += 1
            out.append((base + i, base + j))
            i = j + 1
        else:
            i += 1
    return out


def utf8_lead_intervals(mission):
    """(af_intervals, ubf_lead_intervals) for the SWAR UTF-8 filter."""
    af = decompose_intervals(mission.filter.af, 128)
    iv = decompose_intervals(mission.filter.ubf, 64, base=0xC0)
    iv = [
        (max(lo, 0xC2), min(hi, 0xF4)) for lo, hi in iv if hi >= 0xC2 and lo <= 0xF4
    ]
    return tuple(af), tuple(iv)


def utf16_cp_intervals(mission) -> tuple:
    """Decoded-codepoint intervals for a UTF-16 mission: AF bits map to
    cp 0..0x7F directly; each UBF lead bit maps to its codepoint span
    (2-byte leads: 64 cps, 3-byte: 4096, 4-byte: 256 Ki)."""
    out = list(decompose_intervals(mission.filter.af, 128))
    spans = []
    for bit in range(64):
        if (mission.filter.ubf >> bit) & 1:
            lead = 0xC0 + bit
            if 0xC2 <= lead <= 0xDF:
                spans.append(((lead - 0xC0) << 6, ((lead - 0xC0) << 6) | 0x3F))
            elif 0xE0 <= lead <= 0xEF:
                lo = (lead - 0xE0) << 12
                spans.append((max(lo, 0x800), lo | 0xFFF))
            elif 0xF0 <= lead <= 0xF4:
                lo = max(0x10000, (lead - 0xF0) << 18)
                hi = min(0x10FFFF, ((lead - 0xF0) << 18) | 0x3FFFF)
                if lo <= hi:
                    spans.append((lo, hi))
    spans.sort()
    for lo, hi in spans:
        if out and lo <= out[-1][1] + 1:
            out[-1] = (out[-1][0], max(out[-1][1], hi))
        else:
            out.append((lo, hi))
    return tuple(out)


def swar_params(missions):
    """Static interval parameters for flagship_swar_lanes, or None when
    a filter decomposes into too many intervals to be worth it."""
    m8, mle, mbe = missions[0], missions[1], missions[2]
    af_iv, ubf_iv = utf8_lead_intervals(m8)
    cp_le = utf16_cp_intervals(mle)
    cp_be = utf16_cp_intervals(mbe)
    if len(af_iv) + len(ubf_iv) > 12 or len(cp_le) > 12 or len(cp_be) > 12:
        return None
    greps = tuple(
        -1 if m.filter.grep_char is None else int(m.filter.grep_char)
        for m in (m8, mle, mbe)
    )
    return dict(af_iv=af_iv, ubf_iv=ubf_iv, cp_iv_le=cp_le, cp_iv_be=cp_be,
                greps=greps)
