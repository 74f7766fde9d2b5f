"""Fused Pallas TPU kernel for the hot UTF-8 mission scan.

One pass over the byte stream producing one packed uint8 lane per byte:

  bit 0    : accept     - byte starts a valid char that passes AF/UBF
  bits 1-3 : length     - event input length (1..4) at event starts
  bit 4    : grep match - accepted 1-byte char equal to grep_char
  bit 5    : char start - an event starts here (valid or malformed)
  bit 6    : valid      - the event is a char

This fuses what the jnp path (ops/classify.py + ops/runs.accept_mask)
does in many int32 lanes into a single VMEM-resident pass with uint8
in/out: ~2 bytes of HBM traffic per input byte instead of dozens.

Key structural fact making this a single elementwise pass: UTF-8 events
only ever claim *continuation* bytes, and only events starting at
non-continuation bytes claim anything, so "is this byte an event
start?" depends on at most 3 bytes of lookback and 3 of lookahead - no
scan/cummax primitive needed (the jnp path's cummax is equivalent but
was written before this observation).

Layout: the stream is viewed as (rows, 128) uint8. Cross-tile halos are
provided by three BlockSpecs on the same input (previous tile's tail,
the tile, next tile's head), so the kernel needs no manual DMA.
Byte-stream shifts on the 2-D view are lane rolls patched at the lane
edge with a sublane roll (see _stream_shift).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
# Halo rows on each side of a tile. Only ~4 bytes of look{back,ahead}
# are semantically needed, but Mosaic requires uint8 block sublane
# counts divisible by the (32, 128) tile, so the halo is one full tile.
HALO_ROWS = 32

ACCEPT_BIT = 1
LEN_SHIFT = 1
GREP_BIT = 1 << 4
START_BIT = 1 << 5
VALID_BIT = 1 << 6


def _roll(x, shift, axis):
    """Circular roll; jnp.roll lowers to the TPU roll op in Mosaic and
    also works in interpreter mode."""
    return jnp.roll(x, shift, axis=axis)


def _shift_stream(x, k):
    """x shifted left by k bytes in STREAM order on the (R,128) view
    (lookahead): y[r,c] = flat[r*128+c+k]. Composed of a lane roll
    patched at the lane edge with a sublane roll. Wrap-around pollution
    only reaches the discarded halo rows."""
    y = x
    for _ in range(k):
        first_up = _roll(y[:, 0:1], -1, 0)  # y[r+1, 0]
        y2 = _roll(y, -1, 1)
        col = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
        y = jnp.where(col == LANE - 1, first_up, y2)
    return y


def _utf8_field(b, b1, b2, b3, af, ubf, grep_char):
    """The 7-bit packed mission field for UTF-8 given the byte and its
    three lookahead shifts. `af` is int32[4], `ubf` int32[2],
    `grep_char` scalar (-1 = none)."""
    cont = (b >> 6) == 0b10
    c1 = (b1 >> 6) == 0b10
    c2 = (b2 >> 6) == 0b10
    c3 = (b3 >> 6) == 0b10

    lead1 = b < 0x80
    lead2 = (b >= 0xC2) & (b <= 0xDF)
    lead3 = (b >= 0xE0) & (b <= 0xEF)
    lead4 = (b >= 0xF0) & (b <= 0xF4)

    # Pure boolean algebra (no bool-valued where: Mosaic rejects the i1
    # select as "Unsupported target bitwidth for truncation").
    c1ok3 = c1 & ((b != 0xE0) | (b1 >= 0xA0)) & ((b != 0xED) | (b1 <= 0x9F))
    c1ok4 = c1 & ((b != 0xF0) | (b1 >= 0x90)) & ((b != 0xF4) | (b1 <= 0x8F))

    valid2 = lead2 & c1
    valid3 = lead3 & c1ok3 & c2
    valid4 = lead4 & c1ok4 & c2 & c3
    ev_valid = lead1 | valid2 | valid3 | valid4

    ev_len = jnp.where(valid2, 2, 1)
    ev_len = jnp.where(valid3, 3, ev_len)
    ev_len = jnp.where(valid4, 4, ev_len)
    bad_len = jnp.where(lead3 & c1ok3 & ~c2, 2, 1)
    bad_len = jnp.where(lead4 & c1ok4 & ~c2, 2, bad_len)
    bad_len = jnp.where(lead4 & c1ok4 & c2 & ~c3, 3, bad_len)
    ev_len = jnp.where(ev_valid, ev_len, bad_len)

    # Event start: non-cont bytes always; cont bytes iff no event
    # starting 1..3 bytes back (necessarily at a non-cont byte) claims
    # them. Purely local lookback.
    claim_len = ev_len  # claims = event length (pending claims only at
    # the true stream end, outside any owned tile interior; the caller
    # handles the final chunk tail on the host path)
    claimed = jnp.zeros_like(cont)
    for k in (1, 2, 3):
        nck = _right_shift_stream_bool(~cont, k)
        clk = _right_shift_stream(claim_len, k)
        claimed = claimed | (nck & (clk > k))
    is_start = (~cont) | ~claimed

    # AF/UBF filter on the lead byte (decoded lead == input lead for
    # UTF-8). Branch-free 128/64-bit mask lookup via word selects.
    word_idx = (b >> 5) & 0x3
    afw = jnp.zeros_like(b)
    for wi in range(4):
        afw = jnp.where(word_idx == wi, af[wi], afw)
    af_pass = ((afw >> (b & 0x1F)) & 1) != 0
    ubw = jnp.where(((b >> 5) & 1) == 0, ubf[0], ubf[1])
    ubf_pass = ((ubw >> (b & 0x1F)) & 1) != 0
    passes = (lead1 & af_pass) | (~lead1 & ubf_pass)  # no i1-select

    accept = is_start & ev_valid & passes
    grep = accept & (b == grep_char)

    return (
        accept.astype(jnp.int32) * ACCEPT_BIT
        | (jnp.where(is_start, ev_len, 0) << LEN_SHIFT)
        | grep.astype(jnp.int32) * GREP_BIT
        | is_start.astype(jnp.int32) * START_BIT
        | (is_start & ev_valid).astype(jnp.int32) * VALID_BIT
    )


def _utf8_kernel(af_ref, ubf_ref, grep_ref, prev_ref, cur_ref, next_ref, out_ref):
    """Packed lanes for the owned tile (cur_ref)."""
    x = jnp.concatenate(
        [prev_ref[...], cur_ref[...], next_ref[...]], axis=0
    ).astype(jnp.int32)
    b1 = _shift_stream(x, 1)
    b2 = _shift_stream(x, 2)
    b3 = _shift_stream(x, 3)
    packed = _utf8_field(
        x, b1, b2, b3,
        [af_ref[0, i] for i in range(4)],
        [ubf_ref[0, 0], ubf_ref[0, 1]],
        grep_ref[0, 0],
    )
    rows = cur_ref.shape[0]
    # int32 output: this Mosaic build rejects narrowing i32->i8 stores
    # ("Unsupported target bitwidth for truncation").
    out_ref[...] = packed[HALO_ROWS : HALO_ROWS + rows, :]


def _right_shift_stream(x, k):
    """x shifted right by k bytes in stream order (lookback)."""
    y = x
    for _ in range(k):
        last_down = _roll(y[:, LANE - 1 :], 1, 0)  # y[r-1, 127]
        y2 = _roll(y, 1, 1)
        col = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
        y = jnp.where(col == 0, last_down, y2)
    return y


def _right_shift_stream_bool(x, k):
    return _right_shift_stream(x.astype(jnp.int32), k) != 0


def _select_word(words_ref, n_words, idx):
    """words_ref[0, idx] as a branch-free chain of selects (no gather)."""
    out = jnp.zeros_like(idx)
    for wi in range(n_words):
        out = jnp.where(idx == wi, words_ref[0, wi], out)
    return out


def _utf8_lead_of_cp(cp):
    lead = jnp.where(cp < 0x800, 0xC0 | (cp >> 6), 0xE0 | (cp >> 12))
    lead = jnp.where(cp >= 0x10000, 0xF0 | (cp >> 18), lead)
    return jnp.where(cp < 0x80, cp, lead)


def _utf16_field(b, b1, b2, b3, af, ubf, grep_char, be):
    """The 7-bit packed mission field for UTF-16 LE/BE. `af` int32[4],
    `ubf` int32[2], scalars as values (SMEM-read by the caller)."""
    # Code units at even stream offsets (tiles are whole 128-byte rows,
    # so lane parity == stream parity).
    u = ((b << 8) | b1) if be else ((b1 << 8) | b)
    u_next = ((b2 << 8) | b3) if be else ((b3 << 8) | b2)

    col = jax.lax.broadcasted_iota(jnp.int32, b.shape, 1)
    even = (col & 1) == 0

    high = (u >= 0xD800) & (u <= 0xDBFF)
    low = (u >= 0xDC00) & (u <= 0xDFFF)
    low_next = (u_next >= 0xDC00) & (u_next <= 0xDFFF)
    pair_start = high & low_next
    pair_trail = _right_shift_stream_bool(pair_start, 2) & even
    lone_high = high & ~low_next
    lone_low = low & ~pair_trail
    bmp = ~high & ~low

    astral = 0x10000 + ((u & 0x3FF) << 10) + (u_next & 0x3FF)
    cp = jnp.where(pair_start, astral, u)
    valid = (bmp | pair_start) & even
    start = (bmp | pair_start | lone_high | lone_low) & even
    ev_len = jnp.where(pair_start, 4, 2)

    # AF/UBF filter on the decoded char.
    lead = _utf8_lead_of_cp(cp)
    word_idx = (cp >> 5) & 0x3
    afw = jnp.zeros_like(cp)
    for wi in range(4):
        afw = jnp.where(word_idx == wi, af[wi], afw)
    af_pass = ((afw >> (cp & 0x1F)) & 1) != 0
    ubw = jnp.where(((lead >> 5) & 1) == 0, ubf[0], ubf[1])
    ubf_pass = ((ubw >> (lead & 0x1F)) & 1) != 0
    passes = ((cp < 0x80) & af_pass) | ((cp >= 0x80) & ubf_pass)

    accept = start & valid & passes
    grep = accept & (cp == grep_char)

    return (
        accept.astype(jnp.int32) * ACCEPT_BIT
        | (jnp.where(start, ev_len, 0) << LEN_SHIFT)
        | grep.astype(jnp.int32) * GREP_BIT
        | start.astype(jnp.int32) * START_BIT
        | (start & valid).astype(jnp.int32) * VALID_BIT
    )


def _utf16_kernel_body(be):
    def kernel(af_ref, ubf_ref, grep_ref, prev_ref, cur_ref, next_ref, out_ref):
        x = jnp.concatenate(
            [prev_ref[...], cur_ref[...], next_ref[...]], axis=0
        ).astype(jnp.int32)
        b1 = _shift_stream(x, 1)
        b2 = _shift_stream(x, 2)
        b3 = _shift_stream(x, 3)
        packed = _utf16_field(
            x, b1, b2, b3,
            [af_ref[0, i] for i in range(4)],
            [ubf_ref[0, 0], ubf_ref[0, 1]],
            grep_ref[0, 0], be,
        )
        rows = cur_ref.shape[0]
        out_ref[...] = packed[HALO_ROWS : HALO_ROWS + rows, :]

    return kernel


def _flagship_kernel(params_ref, prev_ref, cur_ref, next_ref, out_ref):
    """The flagship fused kernel: all three conformance-config missions
    (UTF-8, UTF-16LE, UTF-16BE) in ONE pass over the bytes, packing
    three 7-bit mission fields into one int32 lane (bits 0-6 / 8-14 /
    16-22). One byte read + 4 bytes written per input byte, instead of
    three separate passes.

    params_ref: SMEM int32 (3, 8): rows = missions, cols = af0..af3,
    ubf0, ubf1, grep, pad.
    """
    x = jnp.concatenate(
        [prev_ref[...], cur_ref[...], next_ref[...]], axis=0
    ).astype(jnp.int32)
    b1 = _shift_stream(x, 1)
    b2 = _shift_stream(x, 2)
    b3 = _shift_stream(x, 3)

    def params(mi):
        af = [params_ref[mi, i] for i in range(4)]
        ubf = [params_ref[mi, 4], params_ref[mi, 5]]
        return af, ubf, params_ref[mi, 6]

    af0, ubf0, g0 = params(0)
    af1, ubf1, g1 = params(1)
    af2, ubf2, g2 = params(2)
    f0 = _utf8_field(x, b1, b2, b3, af0, ubf0, g0)
    f1 = _utf16_field(x, b1, b2, b3, af1, ubf1, g1, False)
    f2 = _utf16_field(x, b1, b2, b3, af2, ubf2, g2, True)
    packed = f0 | (f1 << 8) | (f2 << 16)
    rows = cur_ref.shape[0]
    out_ref[...] = packed[HALO_ROWS : HALO_ROWS + rows, :]


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def flagship_mission_lanes(
    data_2d: jax.Array,
    params: jax.Array,  # int32 (3, 8): see _flagship_kernel
    tile_rows: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Packed 3-mission lanes (UTF-8 | UTF-16LE<<8 | UTF-16BE<<16)."""
    rows = data_2d.shape[0]
    assert data_2d.shape[1] == LANE and rows % tile_rows == 0
    grid = (rows // tile_rows,)
    in_specs = [
        pl.BlockSpec((3, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(
            (HALO_ROWS, LANE),
            lambda i: (jnp.maximum(i * tile_rows - HALO_ROWS, 0) // HALO_ROWS, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((tile_rows, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (HALO_ROWS, LANE),
            lambda i: (
                jnp.minimum((i + 1) * tile_rows, rows - HALO_ROWS) // HALO_ROWS,
                0,
            ),
            memory_space=pltpu.VMEM,
        ),
    ]
    return pl.pallas_call(
        _flagship_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_rows, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, LANE), jnp.int32),
        interpret=interpret,
    )(params.astype(jnp.int32), data_2d, data_2d, data_2d)


def flagship_params(missions):
    """(3, 8) int32 params for flagship_mission_lanes from the standard
    UTF-8 / UTF-16LE / UTF-16BE mission triple."""
    import numpy as np

    from .runs import filter_words

    out = np.zeros((3, 8), dtype=np.uint32)
    for i, m in enumerate(missions[:3]):
        af_w, ubf_w = filter_words(m)
        out[i, 0:4] = af_w
        out[i, 4:6] = ubf_w
        g = -1 if m.filter.grep_char is None else m.filter.grep_char
        out[i, 6] = np.uint32(g & 0xFFFFFFFF)
    return out.view(np.int32)


def _single_byte_kernel(accept_ref, cp_low_ref, grep_ref, cur_ref, out_ref):
    """Single-byte mission kernel: accept decided by a precomputed
    256-bit mission mask (AF/UBF applied to the decode table on host).
    Each byte is a 1-byte event; grep matches identity-ASCII bytes."""
    b = cur_ref[...].astype(jnp.int32)
    aw = _select_word(accept_ref, 8, (b >> 5) & 0x7)
    accept = ((aw >> (b & 0x1F)) & 1) != 0
    vw = _select_word(cp_low_ref, 8, (b >> 5) & 0x7)
    valid = ((vw >> (b & 0x1F)) & 1) != 0
    grep = accept & (b == grep_ref[0, 0])
    packed = (
        accept.astype(jnp.int32) * ACCEPT_BIT
        | (1 << LEN_SHIFT)
        | grep.astype(jnp.int32) * GREP_BIT
        | START_BIT
        | valid.astype(jnp.int32) * VALID_BIT
    )
    out_ref[...] = packed


@functools.partial(jax.jit, static_argnames=("tile_rows", "big_endian", "interpret"))
def utf16_mission_lanes(
    data_2d: jax.Array,
    af_words: jax.Array,
    ubf_words: jax.Array,
    grep_char: jax.Array,
    big_endian: bool = False,
    tile_rows: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Packed mission lanes for UTF-16 LE/BE over a (rows, 128) view.
    Same caller contract as utf8_mission_lanes (zero-pad rows at both
    stream edges; lone-high-surrogate pending at the true stream end is
    corrected by the host tail pass)."""
    return _paneled_call(
        _utf16_kernel_body(big_endian), data_2d, af_words, ubf_words, grep_char,
        tile_rows, interpret,
    )


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def single_byte_mission_lanes(
    data_2d: jax.Array,
    accept_words: jax.Array,  # uint32[8]: 256-bit accept table
    valid_words: jax.Array,  # uint32[8]: 256-bit validity table
    grep_char: jax.Array,
    tile_rows: int = 512,
    interpret: bool = False,
) -> jax.Array:
    rows = data_2d.shape[0]
    assert rows % tile_rows == 0
    grid = (rows // tile_rows,)
    return pl.pallas_call(
        _single_byte_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_rows, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_rows, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, LANE), jnp.int32),
        interpret=interpret,
    )(
        accept_words.astype(jnp.int32).reshape(1, 8),
        valid_words.astype(jnp.int32).reshape(1, 8),
        grep_char.astype(jnp.int32).reshape(1, 1),
        data_2d,
    )


def single_byte_mission_tables(mission):
    """Host-side 256-bit accept/validity masks for a single-byte
    mission: AF/UBF applied to each byte's decoded codepoint."""
    import numpy as np

    from ..encodings import full_byte_table
    from ..engine.automaton import utf8_lead

    table = full_byte_table(mission.encoding_name)
    accept = np.zeros(8, dtype=np.uint32)
    valid = np.zeros(8, dtype=np.uint32)
    f = mission.filter
    for byte in range(256):
        cp = int(table[byte])
        if cp < 0:
            continue
        valid[byte >> 5] |= np.uint32(1 << (byte & 0x1F))
        ok = f.pass_af_filter(cp) if cp < 0x80 else f.pass_ubf_filter(utf8_lead(cp))
        if ok:
            accept[byte >> 5] |= np.uint32(1 << (byte & 0x1F))
    return accept, valid


def _paneled_call(kernel, data_2d, af_words, ubf_words, grep_char,
                  tile_rows, interpret):
    """Shared scaffolding: grid over row-tiles with previous-tail /
    tile / next-head views of the same input for cross-tile halos.

    rows must be a multiple of tile_rows. The first/last tile's halo
    blocks are clamped duplicates; their influence is masked out by the
    ~4-byte locality (callers pad the stream with >=128 zero bytes on
    each side, which zero-extend cleanly: 0x00 is a 1-byte char).
    """
    rows = data_2d.shape[0]
    assert data_2d.shape[1] == LANE
    assert rows % tile_rows == 0
    ntiles = rows // tile_rows

    grid = (ntiles,)
    in_specs = [
        pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),  # af
        pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),  # ubf
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),  # grep
        pl.BlockSpec(
            (HALO_ROWS, LANE),
            lambda i: (jnp.maximum(i * tile_rows - HALO_ROWS, 0) // HALO_ROWS, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (tile_rows, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (HALO_ROWS, LANE),
            lambda i: (
                jnp.minimum((i + 1) * tile_rows, rows - HALO_ROWS) // HALO_ROWS,
                0,
            ),
            memory_space=pltpu.VMEM,
        ),
    ]
    out_spec = pl.BlockSpec((tile_rows, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((rows, LANE), jnp.int32),
        interpret=interpret,
    )(
        af_words.astype(jnp.int32).reshape(1, 4),
        ubf_words.astype(jnp.int32).reshape(1, 2),
        grep_char.astype(jnp.int32).reshape(1, 1),
        data_2d,
        data_2d,
        data_2d,
    )


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def utf8_mission_lanes(
    data_2d: jax.Array,
    af_words: jax.Array,
    ubf_words: jax.Array,
    grep_char: jax.Array,
    tile_rows: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Packed mission lanes for a (rows, 128) uint8 view of the stream."""
    return _paneled_call(
        _utf8_kernel, data_2d, af_words, ubf_words, grep_char, tile_rows, interpret
    )
