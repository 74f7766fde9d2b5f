"""Mission filter masks and accepted-run compaction on device.

This is the TPU analog of the reference's hot path (SURVEY.md section 7
steps 2-4): the per-char filter walk of SplitStr (helper.rs:237-332)
becomes per-byte boolean lanes + a segmented-run compaction, all fused
by XLA on device. The output is a fixed-capacity run table
(start, end, char_count) of maximal accepted-char runs - the sparse
summary the host emission automaton (or the native emitter) consumes
instead of raw bytes.

Filter semantics (mission.rs:307-348): a char passes iff
  cp < 0x80:  AF bit `cp` set
  cp >= 0x80: UBF bit `(utf8_lead(cp) & 0x3f)` set
The grep-char and same-block rules operate at run level and are applied
downstream; per-run grep counts are produced here so most runs can be
filtered without touching bytes again.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..mission import Mission
from .classify import Lanes


class RunTable(NamedTuple):
    """Fixed-capacity table of maximal accepted runs in a chunk."""

    start: jax.Array  # int32[K]: byte offset of run start
    end: jax.Array  # int32[K]: byte offset one past the run's last byte
    chars: jax.Array  # int32[K]: number of chars in the run
    grep_hits: jax.Array  # int32[K]: chars equal to grep_char
    count: jax.Array  # int32[]: number of valid rows
    overflow: jax.Array  # bool[]: table capacity exceeded


def utf8_lead_of_cp(cp: jax.Array) -> jax.Array:
    """UTF-8 leading byte of a codepoint (vector form of
    engine/automaton.py:utf8_lead)."""
    return jnp.where(
        cp < 0x80,
        cp,
        jnp.where(
            cp < 0x800,
            0xC0 | (cp >> 6),
            jnp.where(cp < 0x10000, 0xE0 | (cp >> 12), 0xF0 | (cp >> 18)),
        ),
    )


def accept_mask(lanes: Lanes, af_words: jax.Array, ubf_words: jax.Array) -> jax.Array:
    """Per-byte accept lane: byte starts a char that passes the AF/UBF
    filter. `af_words` is the 128-bit AF mask as uint32[4], `ubf_words`
    the 64-bit UBF mask as uint32[2].

    The bit lookup is branch-free: select the mask word with arithmetic
    (no gather), then test the bit - VPU-friendly.
    """
    cp = lanes.cp
    is_char = lanes.valid & lanes.start & (cp >= 0)

    # ASCII: bit cp of the 128-bit AF mask.
    word_idx = (cp >> 5) & 0x3  # which uint32 word
    bit = cp & 0x1F
    afw = jnp.zeros_like(cp)
    for wi in range(4):
        afw = jnp.where(word_idx == wi, af_words[wi].astype(jnp.int32), afw)
    af_pass = ((afw >> bit) & 1) != 0

    # Multibyte: bit (lead & 0x3f) of the 64-bit UBF mask.
    lead = utf8_lead_of_cp(jnp.maximum(cp, 0))
    ub = lead & 0x3F
    ubw = jnp.where((ub >> 5) == 0, ubf_words[0].astype(jnp.int32), ubf_words[1].astype(jnp.int32))
    ubf_pass = ((ubw >> (ub & 0x1F)) & 1) != 0

    passes = jnp.where(cp < 0x80, af_pass, ubf_pass)
    return is_char & passes


def filter_words(m: Mission):
    """Mission filter masks as device-friendly uint32 words."""
    af = m.filter.af
    ubf = m.filter.ubf
    af_words = np.array([(af >> (32 * i)) & 0xFFFFFFFF for i in range(4)], dtype=np.uint32)
    ubf_words = np.array([(ubf >> (32 * i)) & 0xFFFFFFFF for i in range(2)], dtype=np.uint32)
    return af_words, ubf_words


@functools.partial(jax.jit, static_argnames=("capacity", "field_shift"))
def extract_runs_packed(
    packed: jax.Array, capacity: int = 4096, field_shift: int = 0
) -> RunTable:
    """Run compaction from the Pallas kernels' packed lanes
    (ops/pallas_scan.py bit layout): accept bit 0, length bits 1-3,
    grep bit 4. `field_shift` selects a mission field from the fused
    flagship kernel (0 / 8 / 16). Same output as extract_runs."""
    p = (packed.reshape(-1).astype(jnp.int32) >> field_shift) & 0x7F
    accept = (p & 1) != 0
    length = (p >> 1) & 7
    gflag = (p & 16) != 0
    return _compact_runs(accept, length, gflag, capacity)


_M01 = 0x01010101


@functools.partial(jax.jit, static_argnames=("capacity",))
def extract_runs_packed4(words: jax.Array, capacity: int = 4096) -> RunTable:
    """Run compaction from SWAR word-packed lanes (ops/pallas_swar.py):
    one int32 word per 4 stream bytes, an 8-bit field per byte slot
    (UTF-16 words populate slots 0 and 2 only, which is exactly the
    per-byte view of unit starts). Stage 1 stays in SWAR form - no
    per-byte unpacking of the full stream; only the capacity-sized
    boundary slabs are expanded."""
    w = words.reshape(-1)
    nw = w.shape[0]
    n = nw * 4  # byte positions

    def lsr(x, k):
        return (x >> k) & ((1 << (32 - k)) - 1) if k else x

    acc = w & _M01
    lf = lsr(w, 1) & (7 * _M01)
    gf = lsr(w, 4) & _M01

    m80 = jnp.int32(0x80808080 - (1 << 32))  # 0x80808080 as signed i32

    def zero_bytes(y):
        """0x01 per zero byte of y (y byte values < 0x80)."""
        return lsr((y - _M01) & ~y & m80, 7)

    def eq_len(L):
        return zero_bytes(lf ^ (L * _M01)) & acc  # accepted with len L

    def wshift(x, k):  # word lookbehind/ahead on the flat array
        if k > 0:
            return jnp.concatenate([jnp.zeros(k, x.dtype), x[: nw - k]])
        return jnp.concatenate([x[-k:], jnp.zeros(-k, x.dtype)])

    def bshift_back(x, kb):  # byte-slot shift toward higher positions
        xp = wshift(x, 1)
        return ((x << (8 * kb)) | lsr(xp, 32 - 8 * kb)) & _M01

    def bshift_fwd(x, kb):
        xn = wshift(x, -1)
        return (lsr(x, 8 * kb) | (xn << (32 - 8 * kb))) & _M01

    cont_prev = jnp.zeros_like(w)
    joins_next = jnp.zeros_like(w)
    for L in (1, 2, 3, 4):
        eL = eq_len(L)
        cont_prev |= bshift_back(eL, L)
        joins_next |= zero_bytes(lf ^ (L * _M01)) & bshift_fwd(acc, L)
    run_start = acc & ~cont_prev & _M01
    run_end = acc & ~joins_next & _M01

    # Stage 1: per-block counts; byte-sums per word via the multiply
    # trick, three quantities per reduce via 10-bit packing.
    bw = _BLOCK // 4  # words per block
    nb = nw // bw if nw % bw == 0 else None
    if nb is None:
        pad = bw - nw % bw
        z = jnp.zeros(pad, w.dtype)
        run_start = jnp.concatenate([run_start, z])
        run_end = jnp.concatenate([run_end, z])
        acc = jnp.concatenate([acc, z])
        gf = jnp.concatenate([gf, z])
        lf = jnp.concatenate([lf, z])
        w = jnp.concatenate([w, z])
        nw = w.shape[0]
        nb = nw // bw

    def word_bytesum(x):  # sum of the 4 byte slots (values <= 4)
        return lsr(x * _M01, 24)

    enc = (
        word_bytesum(run_start)
        + (word_bytesum(run_end) << 10)
        + (word_bytesum(acc) << 20)
    )
    blk = jnp.sum(enc.reshape(nb, bw), axis=1)
    bc_start = blk & 0x3FF
    bc_end = (blk >> 10) & 0x3FF
    bc_accept = blk >> 20
    bc_grep = jnp.sum(word_bytesum(gf).reshape(nb, bw), axis=1)

    cum_start = jnp.cumsum(bc_start)
    cum_end = jnp.cumsum(bc_end)
    cum_accept = jnp.cumsum(bc_accept)
    cum_grep = jnp.cumsum(bc_grep)
    nruns = cum_start[-1]

    k = jnp.arange(1, capacity + 1, dtype=jnp.int32)
    row_ok = k <= nruns

    def expand(slab_words):  # (K, bw) words -> (K, 4*bw) byte fields
        parts = [lsr(slab_words, 8 * j) & 0xFF for j in range(4)]
        return jnp.stack(parts, axis=-1).reshape(slab_words.shape[0], bw * 4)

    wm = w.reshape(nb, bw)

    def locate(flag_bit_shift, blk_cum):
        """Byte positions of the k-th set flags; flag extracted from the
        gathered word slabs (bit `flag_bit_shift` of each byte field)."""
        b = jnp.minimum(jnp.searchsorted(blk_cum, k, side="left"), nb - 1)
        prev = jnp.where(b > 0, blk_cum[jnp.maximum(b - 1, 0)], 0)
        local_k = k - prev
        slab = expand(wm[b])  # (K, _BLOCK) byte fields
        return b, slab, local_k

    # run_start / run_end flags must be recomputed inside slabs; to
    # avoid neighbor effects at slab edges, gather the *flag words*
    # instead of recomputing: materialize them (2 streaming writes).
    rs_m = run_start.reshape(nb, bw)
    re_m = run_end.reshape(nb, bw)
    acc_m = acc.reshape(nb, bw)
    gf_m = gf.reshape(nb, bw)
    lf_m = lf.reshape(nb, bw)

    def locate2(flags_m, blk_cum):
        b = jnp.minimum(jnp.searchsorted(blk_cum, k, side="left"), nb - 1)
        prev = jnp.where(b > 0, blk_cum[jnp.maximum(b - 1, 0)], 0)
        local_k = k - prev
        slab = expand(flags_m[b])  # 0/1 per byte
        local_cum = jnp.cumsum(slab, axis=1)
        pos = jax.vmap(lambda c, t: jnp.searchsorted(c, t, side="left"))(
            local_cum, local_k
        ).astype(jnp.int32)
        pos = jnp.minimum(pos, _BLOCK - 1)
        return jnp.minimum(b * _BLOCK + pos, n - 1), b, pos

    si_c, sb, sp = locate2(rs_m, cum_start)
    ei_c, eb, ep = locate2(re_m, cum_end)

    def pref_at(flags_m, blk_cum, bx, px):
        prev = jnp.where(bx > 0, blk_cum[jnp.maximum(bx - 1, 0)], 0)
        slab = expand(flags_m[bx])
        idxs = jnp.arange(_BLOCK, dtype=jnp.int32)[None, :]
        local = jnp.sum(jnp.where(idxs <= px[:, None], slab, 0), axis=1)
        return prev + local

    pc_e = pref_at(acc_m, cum_accept, eb, ep)
    pc_s = pref_at(acc_m, cum_accept, sb, sp)
    pg_e = pref_at(gf_m, cum_grep, eb, ep)
    pg_s = pref_at(gf_m, cum_grep, sb, sp)

    len_at_e = expand(lf_m[eb])[jnp.arange(capacity), ep]
    g_at_s = expand(gf_m[sb])[jnp.arange(capacity), sp]

    start = jnp.where(row_ok, si_c, jnp.int32(2**31 - 1))
    end = jnp.where(row_ok, ei_c + len_at_e, 0)
    chars = jnp.where(row_ok, pc_e - pc_s + 1, 0)
    grep_hits = jnp.where(row_ok, pg_e - pg_s + g_at_s, 0)

    return RunTable(
        start=start,
        end=end,
        chars=chars,
        grep_hits=grep_hits,
        count=jnp.minimum(nruns, capacity),
        overflow=nruns > capacity,
    )


@functools.partial(jax.jit, static_argnames=("capacity",))
def extract_runs(
    lanes: Lanes,
    af_words: jax.Array,
    ubf_words: jax.Array,
    grep_char: jax.Array,
    capacity: int = 4096,
) -> RunTable:
    """Compact maximal accepted-char runs into a fixed-size table.

    A run is a maximal sequence of chars that all pass the AF/UBF
    filter (bytes inside a multi-byte char belong to their char; runs
    break at rejected chars, malformed sequences and gaps).

    Deliberately scatter-free for the TPU: run adjacency is decided
    with <=4 static shifts (chars are 1-4 bytes), run boundaries are
    located with cumsum + a capacity-sized vectorized searchsorted, and
    per-run aggregates come from prefix-sum differences gathered at the
    capacity-sized boundary vectors. Everything large is elementwise,
    cumsum, or a K-sized gather - no O(n) scatter.
    """
    accept = accept_mask(lanes, af_words, ubf_words)
    gflag = accept & (lanes.cp == grep_char)
    return _compact_runs(accept, lanes.length, gflag, capacity)


_BLOCK = 512  # hierarchical compaction block (bytes)


def _compact_runs(accept, length, gflag, capacity: int) -> RunTable:
    """Hierarchical (two-level) run-boundary compaction.

    Full-length cumsums dominate on TPU (~1 ms per pass at 16 MB), so
    instead: (1) one fused elementwise pass derives the boundary flags
    and reduces per-512-byte-block counts (boundary+accept counts are
    bit-packed so one reduction covers three quantities); (2) tiny
    cumsums over block counts locate each of the <=capacity runs'
    blocks via binary search; (3) only the selected blocks (capacity x
    512 slabs) are gathered and locally scanned. Full-array work is a
    couple of streaming passes; everything else is K-sized.
    """
    n0 = accept.shape[0]
    n = ((n0 + _BLOCK - 1) // _BLOCK) * _BLOCK
    if n != n0:
        pad = n - n0
        accept = jnp.concatenate([accept, jnp.zeros(pad, accept.dtype)])
        length = jnp.concatenate([length, jnp.ones(pad, length.dtype)])
        gflag = jnp.concatenate([gflag, jnp.zeros(pad, gflag.dtype)])
    nb = n // _BLOCK

    def shift_right(x, k):
        return jnp.concatenate([jnp.zeros((k,), x.dtype), x[: n - k]])

    def shift_left(x, k):
        return jnp.concatenate([x[k:], jnp.zeros((k,), x.dtype)])

    # continued-from-previous: an accepted char of length L ends here.
    cont_prev = jnp.zeros(n, bool)
    joins_next = jnp.zeros(n, bool)
    for L in (1, 2, 3, 4):
        cont_prev |= shift_right(accept & (length == L), L)
        joins_next |= (length == L) & shift_left(accept, L)
    run_start = accept & ~cont_prev
    run_end = accept & ~(joins_next & accept)

    # Stage 1: per-block counts, three quantities packed in one reduce
    # (counts <= _BLOCK = 512 < 1024 fit 10-bit fields).
    enc = (
        run_start.astype(jnp.int32)
        + (run_end.astype(jnp.int32) << 10)
        + (accept.astype(jnp.int32) << 20)
    )
    blk = jnp.sum(enc.reshape(nb, _BLOCK), axis=1)
    bc_start = blk & 0x3FF
    bc_end = (blk >> 10) & 0x3FF
    bc_accept = blk >> 20
    bc_grep = jnp.sum(gflag.reshape(nb, _BLOCK).astype(jnp.int32), axis=1)

    # Stage 2: tiny block-level cumsums.
    cum_start = jnp.cumsum(bc_start)
    cum_end = jnp.cumsum(bc_end)
    cum_accept = jnp.cumsum(bc_accept)
    cum_grep = jnp.cumsum(bc_grep)
    nruns = cum_start[-1]

    k = jnp.arange(1, capacity + 1, dtype=jnp.int32)
    row_ok = k <= nruns

    def locate(flags, blk_cum):
        """Positions of the k-th set flags (1-based k)."""
        b = jnp.minimum(jnp.searchsorted(blk_cum, k, side="left"), nb - 1)
        prev = jnp.where(b > 0, blk_cum[jnp.maximum(b - 1, 0)], 0)
        local_k = k - prev
        slab = flags.reshape(nb, _BLOCK)[b].astype(jnp.int32)  # (K, B)
        local_cum = jnp.cumsum(slab, axis=1)
        pos = jax.vmap(lambda c, t: jnp.searchsorted(c, t, side="left"))(
            local_cum, local_k
        ).astype(jnp.int32)
        return jnp.minimum(b * _BLOCK + jnp.minimum(pos, _BLOCK - 1), n - 1), b

    si_c, sb = locate(run_start, cum_start)
    ei_c, eb = locate(run_end, cum_end)

    def pref_at(flags, blk_cum, x, bx):
        """#set flags in [0..x] via block cumsum + local slab sum."""
        prev = jnp.where(bx > 0, blk_cum[jnp.maximum(bx - 1, 0)], 0)
        slab = flags.reshape(nb, _BLOCK)[bx].astype(jnp.int32)  # (K, B)
        off = x - bx * _BLOCK
        idxs = jnp.arange(_BLOCK, dtype=jnp.int32)[None, :]
        local = jnp.sum(jnp.where(idxs <= off[:, None], slab, 0), axis=1)
        return prev + local

    pc_e = pref_at(accept, cum_accept, ei_c, eb)
    pc_s = pref_at(accept, cum_accept, si_c, sb)
    pg_e = pref_at(gflag, cum_grep, ei_c, eb)
    pg_s = pref_at(gflag, cum_grep, si_c, sb)

    length_at_e = length.reshape(nb, _BLOCK)[eb][
        jnp.arange(capacity), jnp.minimum(ei_c - eb * _BLOCK, _BLOCK - 1)
    ]
    g_at_s = (
        gflag.reshape(nb, _BLOCK)[sb][
            jnp.arange(capacity), jnp.minimum(si_c - sb * _BLOCK, _BLOCK - 1)
        ]
    ).astype(jnp.int32)

    start = jnp.where(row_ok, si_c, jnp.int32(2**31 - 1))
    end = jnp.where(row_ok, ei_c + length_at_e, 0)
    chars = jnp.where(row_ok, pc_e - pc_s + 1, 0)
    grep_hits = jnp.where(row_ok, pg_e - pg_s + g_at_s, 0)

    return RunTable(
        start=start,
        end=end,
        chars=chars,
        grep_hits=grep_hits,
        count=jnp.minimum(nruns, capacity),
        overflow=nruns > capacity,
    )
