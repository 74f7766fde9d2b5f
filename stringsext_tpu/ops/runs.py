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
    filter, measured over char-start positions (bytes inside a
    multi-byte char belong to their char). Segmented reduction is done
    with cumsum + scatter (XLA lowers this efficiently on TPU).
    """
    n = lanes.cp.shape[0]
    accept = accept_mask(lanes, af_words, ubf_words)

    # next char-start after each accepted char (for run end offsets).
    char_end = jnp.where(accept, jnp.arange(n, dtype=jnp.int32) + lanes.length, 0)

    # A char-start position is "covered" if accepted; runs break where
    # the *char chain* breaks. Two accepted chars are adjacent in a run
    # iff the second starts exactly where the first ends AND both pass.
    # Scatter each accepted char's end to that position; ends == n can
    # never join a following char and are dropped (index n).
    ends_idx = jnp.where(accept & (char_end < n), char_end, n)
    prev_accept_end = (
        jnp.zeros(n + 1, jnp.int32).at[ends_idx].max(jnp.where(accept, char_end, 0))[:n]
    )
    idx = jnp.arange(n, dtype=jnp.int32)
    joined = accept & (prev_accept_end == idx) & (idx > 0)
    run_start = accept & ~joined

    run_id = jnp.cumsum(run_start.astype(jnp.int32)) - 1  # per position
    nruns = jnp.maximum(run_id[-1] + 1, 0) if n > 0 else jnp.int32(0)

    # Scatter per-run aggregates.
    rid = jnp.where(accept, run_id, capacity)  # drop non-accepted
    rid = jnp.minimum(rid, capacity)  # overflow rows collapse to slot K
    starts = jnp.full((capacity + 1,), jnp.int32(2**31 - 1))
    starts = starts.at[jnp.where(run_start, jnp.minimum(run_id, capacity), capacity)].min(idx)
    ends = jnp.zeros((capacity + 1,), jnp.int32).at[rid].max(char_end)
    chars = jnp.zeros((capacity + 1,), jnp.int32).at[rid].add(accept.astype(jnp.int32))
    grep_hits = jnp.zeros((capacity + 1,), jnp.int32).at[rid].add(
        (accept & (lanes.cp == grep_char)).astype(jnp.int32)
    )

    return RunTable(
        start=starts[:capacity],
        end=ends[:capacity],
        chars=chars[:capacity],
        grep_hits=grep_hits[:capacity],
        count=jnp.minimum(nruns, capacity),
        overflow=nruns > capacity,
    )
