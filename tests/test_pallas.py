"""Pallas UTF-8 mission kernel: interpret-mode equivalence with the jnp
lanes + filter path, and run-table equality from packed lanes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stringsext_tpu.mission import Missions
from stringsext_tpu.ops import classify, pallas_scan
from stringsext_tpu.ops.runs import (
    accept_mask,
    extract_runs,
    extract_runs_packed,
    filter_words,
)

rng = np.random.default_rng(17)


def _mission(grep=None):
    return Missions.new(
        flag_encoding=["UTF-8"], flag_grep_char=grep,
        flag_unicode_block_filter="Default",
    )[0]


def _corpus(rows):
    n = rows * 128
    raw = rng.integers(0, 256, size=n, dtype=np.uint8)
    text = "mixed text déjà €uro \U0001F600 with ? marks".encode()
    for off in range(200, n - len(text) - 130, 997):
        raw[off : off + len(text)] = np.frombuffer(text, np.uint8)
    raw[:128] = 0
    raw[-128:] = 0
    return raw


@pytest.mark.parametrize("grep", [None, "63"])
def test_pallas_matches_jnp_lanes(grep):
    m = _mission(grep)
    af_w, ubf_w = filter_words(m)
    g = -1 if m.filter.grep_char is None else m.filter.grep_char
    rows, tile = 128, 32
    raw = _corpus(rows)

    packed = np.asarray(
        pallas_scan.utf8_mission_lanes(
            jnp.asarray(raw.reshape(rows, 128)),
            jnp.asarray(af_w), jnp.asarray(ubf_w), jnp.int32(g),
            tile_rows=tile, interpret=True,
        )
    ).reshape(-1)

    lanes = classify.utf8_lanes(jnp.asarray(raw), len(raw))
    acc = np.asarray(accept_mask(lanes, jnp.asarray(af_w), jnp.asarray(ubf_w)))
    start = np.asarray(lanes.start)
    length = np.asarray(lanes.length)
    cp = np.asarray(lanes.cp)

    sl = slice(128, len(raw) - 128)  # zero-pad rows excluded
    np.testing.assert_array_equal(((packed & 1) != 0)[sl], acc[sl], "accept")
    np.testing.assert_array_equal(
        (((packed >> 5) & 1) != 0)[sl], start[sl], "start"
    )
    np.testing.assert_array_equal(
        ((packed >> 1) & 7)[sl], np.where(start, length, 0)[sl], "length"
    )
    if g >= 0:
        np.testing.assert_array_equal(
            ((packed & 16) != 0)[sl], (acc & (cp == g))[sl], "grep"
        )

    # Run tables from packed lanes == run tables from jnp lanes.
    rt_a = extract_runs(lanes, jnp.asarray(af_w), jnp.asarray(ubf_w), jnp.int32(g),
                        capacity=512)
    rt_b = extract_runs_packed(jnp.asarray(packed), capacity=512)
    ca, cb = int(rt_a.count), int(rt_b.count)
    assert ca == cb
    for f in ("start", "end", "chars", "grep_hits"):
        np.testing.assert_array_equal(
            np.asarray(getattr(rt_a, f))[:ca], np.asarray(getattr(rt_b, f))[:cb], f
        )


def _compare_packed_vs_jnp(packed, lanes, af_w, ubf_w, g, sl):
    acc = np.asarray(accept_mask(lanes, jnp.asarray(af_w), jnp.asarray(ubf_w)))
    start = np.asarray(lanes.start & ~lanes.pending)
    length = np.asarray(lanes.length)
    cp = np.asarray(lanes.cp)
    np.testing.assert_array_equal(((packed & 1) != 0)[sl], acc[sl], "accept")
    np.testing.assert_array_equal((((packed >> 5) & 1) != 0)[sl], start[sl], "start")
    got_len = np.where(((packed >> 5) & 1) != 0, (packed >> 1) & 7, 0)[sl]
    np.testing.assert_array_equal(got_len, np.where(start, length, 0)[sl], "length")
    if g >= 0:
        np.testing.assert_array_equal(
            ((packed & 16) != 0)[sl], (acc & (cp == g))[sl], "grep"
        )


@pytest.mark.parametrize("be", [False, True])
def test_pallas_utf16_matches_jnp(be):
    enc = "utf-16be" if be else "utf-16le"
    m = Missions.new(flag_encoding=[enc], flag_grep_char="63",
                     flag_unicode_block_filter="Default")[0]
    af_w, ubf_w = filter_words(m)
    g = 63
    rows = 64
    raw = _corpus(rows)
    packed = np.asarray(
        pallas_scan.utf16_mission_lanes(
            jnp.asarray(raw.reshape(rows, 128)),
            jnp.asarray(af_w), jnp.asarray(ubf_w), jnp.int32(g),
            big_endian=be, tile_rows=32, interpret=True,
        )
    ).reshape(-1)
    lanes = classify.utf16_lanes(jnp.asarray(raw), be, len(raw))
    _compare_packed_vs_jnp(packed, lanes, af_w, ubf_w, g, slice(128, len(raw) - 128))


def test_pallas_single_byte_matches_jnp():
    m = Missions.new(flag_encoding=["windows-1251"], flag_grep_char="47",
                     flag_unicode_block_filter="Default")[0]
    af_w, ubf_w = filter_words(m)
    acc_t, val_t = pallas_scan.single_byte_mission_tables(m)
    rows = 64
    raw = _corpus(rows)
    packed = np.asarray(
        pallas_scan.single_byte_mission_lanes(
            jnp.asarray(raw.reshape(rows, 128)),
            jnp.asarray(acc_t), jnp.asarray(val_t), jnp.int32(47),
            tile_rows=32, interpret=True,
        )
    ).reshape(-1)
    lanes = classify.single_byte_lanes(jnp.asarray(raw), m.encoding_name, len(raw))
    _compare_packed_vs_jnp(packed, lanes, af_w, ubf_w, 47, slice(128, len(raw) - 128))
