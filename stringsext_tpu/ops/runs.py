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


def _compact_runs(accept, length, gflag, capacity: int) -> RunTable:
    """Boundary location via cumsum + capacity-sized vectorized
    searchsorted (binary search; cheap). The expensive part of the
    pipeline is the classification lanes, kept gather-free so XLA can
    fuse them."""
    n = accept.shape[0]

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

    cs_start = jnp.cumsum(run_start.astype(jnp.int32))
    cs_end = jnp.cumsum(run_end.astype(jnp.int32))
    nruns = cs_start[-1]

    k = jnp.arange(1, capacity + 1, dtype=jnp.int32)
    si_c = jnp.minimum(jnp.searchsorted(cs_start, k, side="left"), n - 1).astype(
        jnp.int32
    )
    ei_c = jnp.minimum(jnp.searchsorted(cs_end, k, side="left"), n - 1).astype(
        jnp.int32
    )
    row_ok = k <= nruns

    pref_chars = jnp.cumsum(accept.astype(jnp.int32))
    pref_grep = jnp.cumsum(gflag.astype(jnp.int32))

    start = jnp.where(row_ok, si_c, jnp.int32(2**31 - 1))
    end = jnp.where(row_ok, ei_c + length[ei_c], 0)
    chars = jnp.where(row_ok, pref_chars[ei_c] - pref_chars[si_c] + 1, 0)
    grep_hits = jnp.where(
        row_ok, pref_grep[ei_c] - pref_grep[si_c] + gflag[si_c].astype(jnp.int32), 0
    )

    return RunTable(
        start=start,
        end=end,
        chars=chars,
        grep_hits=grep_hits,
        count=jnp.minimum(nruns, capacity),
        overflow=nruns > capacity,
    )
