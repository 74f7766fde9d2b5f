"""Differential pins for the emitter's full-window fast lanes.

The native engine takes three shortcut paths on dense input (see
native/emitter.cpp): the accepted-ASCII full-window lane, the UTF-16
BMP full-window lane, and the UTF-8 sterile-call lookahead. Each is
provably equivalent to the generic event walk; these tests pin that
equivalence against the pure-Python oracle on corpora SHAPED to sit on
every lane precondition boundary (window-aligned runs, runs cut one
byte short, surrogates at window edges, chars_min > line_max, grep
chars, non-contiguous AF sets, continuation flags entering a window).

Reference grammar: finding_collection.rs:84-342 (windows),
helper.rs:226-392 (wrapping + boundary flags).
"""

import io

import numpy as np
import pytest

from stringsext_tpu.cli import parse_args
from stringsext_tpu.mission import Missions
from stringsext_tpu.run import run


def _both_engines(argv, data):
    import tempfile, os

    outs = {}
    with tempfile.NamedTemporaryFile(delete=False) as f:
        f.write(data)
        path = f.name
    ofd, opath = tempfile.mkstemp()
    os.close(ofd)
    try:
        for eng in ("python", "auto"):
            args = parse_args(argv + ["--", path])
            buf = io.BytesIO()
            run(args, out=buf, engine=eng)
            outs[eng] = buf.getvalue()
        # Real-fd output: the fused se_merge_fd + SE_INREF zero-copy
        # pipeline only engages on OS-level outputs (BytesIO has no
        # fileno, so the passes above take the fallback formatter) -
        # pin the memory-safety-critical fused path byte-for-byte too.
        args = parse_args(argv + ["--", path])
        with open(opath, "wb") as fo:
            run(args, out=fo, engine="auto")
        with open(opath, "rb") as fo:
            outs["fd"] = fo.read()
    finally:
        os.unlink(path)
        os.unlink(opath)
    assert outs["python"] == outs["auto"]
    assert outs["fd"] == outs["auto"]
    return outs["auto"]


BASE = ["-t", "x", "-e", "UTF-8"]


def test_ascii_lane_window_aligned_run():
    # 4096-byte all-accepted text: every window full -> pure lane path.
    data = (b"abcdefgh" * 512)[:4096]
    out = _both_engines(BASE, data)
    assert out.count(b"\n") >= 64  # 4096/64 wrapped lines


def test_ascii_lane_run_cut_one_byte_short_of_window():
    # A 127-byte accepted run inside each 128-byte window (one \0):
    # the lane precheck fails every window -> generic path, same output.
    blk = b"x" * 127 + b"\x00"
    _both_engines(BASE, blk * 64)


def test_ascii_lane_run_ends_exactly_at_window_edge():
    # accepted run ends exactly at a window boundary, next window cold
    data = (b"y" * 128 + b"\xff" * 128) * 32
    _both_engines(BASE, data)


def test_ascii_lane_flag_propagation_across_windows():
    # 3 full windows then a short tail: first window's chunk1 has no
    # '+', everything after completes (continuation flag chain).
    data = b"z" * (128 * 3 + 17)
    out = _both_engines(BASE, data)
    assert b"+" in out


def test_ascii_lane_respects_min_greater_than_line_max():
    # chars_min(40) > line_max(-q 36/2=...)? -q sets line max directly;
    # use -n 40 -q 36: chars_min > line_max disables the lane (a
    # wrapped 36-char chunk fails min); generic path must agree.
    data = b"m" * 1024
    _both_engines(["-t", "x", "-e", "UTF-8", "-n", "40", "-q", "36"], data)


def test_ascii_lane_disabled_by_grep_char():
    data = b"g" * 512 + b"?" + b"g" * 511
    _both_engines(["-t", "x", "-e", "UTF-8", "-g", "63"], data)


def test_ascii_lane_non_contiguous_af():
    # AF accepting only hex digits + 'x' (non-contiguous set): SWAR
    # range check must not engage wrongly.
    data = b"0x1f2e3d4c" * 120
    # digits (bits 48-57) + 'x' (bit 120): a non-contiguous accept set
    _both_engines(
        ["-t", "x", "-e", "UTF-8", "-a",
         "0x010000000000000003ff000000000000"],
        data,
    )


def test_utf16_lane_bmp_full_windows():
    text = ("中文测试" * 400).encode("utf-16le")
    _both_engines(["-t", "x", "-e", "utf-16le"], text)


def test_utf16_lane_surrogate_pair_at_window_edge():
    # Astral chars force surrogate pairs; some straddle window edges ->
    # lane bails, generic path handles the pair carry.
    text = ("a\U0001F600" * 300).encode("utf-16le")
    _both_engines(["-t", "x", "-e", "utf-16le"], text)
    _both_engines(["-t", "x", "-e", "utf-16be"],
                  ("b\U0001F601" * 300).encode("utf-16be"))


def test_utf16_lane_lone_surrogates_interleaved():
    unit = b"A\x00" * 20 + b"\x00\xd8" + b"B\x00" * 20
    _both_engines(["-t", "x", "-e", "utf-16le", "-n", "4"], unit * 16)


def test_sterile_lookahead_uniform_random():
    rng = np.random.default_rng(99)
    data = rng.integers(0, 256, 65536, dtype=np.uint8).tobytes()
    _both_engines(BASE, data)


def test_sterile_lookahead_runs_just_below_and_at_min():
    # valid 3-char and 4-char runs separated by malformed bytes with
    # -n 4: 3-char runs are sterile-consumed, 4-char runs must emit.
    piece = b"abc\xff" + b"wxyz\xff" + b"\xe4\xb8\xad\xe6\x96\x87\xff"
    _both_engines(["-t", "x", "-e", "UTF-8", "-n", "4"], piece * 300)


def test_sterile_lookahead_pending_tail_at_stream_end():
    # stream ends mid-multibyte inside a junk run
    data = b"\xff\xfeab\xff" * 100 + b"\xe4\xb8"
    _both_engines(BASE, data)


def test_lanes_with_same_block_filter():
    text = ("абв abc " * 200).encode()
    _both_engines(["-t", "x", "-e", "UTF-8", "-r"], text)


def test_mixed_dense_all_lanes_together():
    rng = np.random.default_rng(5)
    parts = []
    for _ in range(200):
        r = rng.random()
        if r < 0.5:
            parts.append(bytes(rng.choice(list(b"abcdefgh "), 200)))
        elif r < 0.75:
            parts.append("wide text".encode("utf-16le") * 4)
        else:
            parts.append(rng.integers(0, 256, 60, dtype=np.uint8).tobytes())
    data = b"".join(parts)
    for enc in (["-e", "UTF-8"], ["-e", "utf-16le"],
                ["-e", "UTF-8", "-e", "utf-16le", "-e", "utf-16be"]):
        _both_engines(["-t", "x", "-n", "6"] + enc, data)


def test_sbyte_lane_accepted_highbyte_window():
    # full windows of accepted KOI8-R Cyrillic: the sbyte transcode
    # lane's prime shape (2 wrapped findings per window)
    text = "в лесу родилась ёлочка в лесу она росла ".encode("koi8_r")
    out = _both_engines(["-t", "x", "-e", "KOI8-R"], text * 120)
    assert out.count(b"\n") > 50


def test_sbyte_lane_run_cut_one_byte_short():
    blk = "ж".encode("koi8_r") * 127 + b"\x00"
    _both_engines(["-t", "x", "-e", "KOI8-R"], blk * 48)


def test_sbyte_lane_same_block_guard():
    # -r (same-unicode-block): mixed Cyrillic/Latin-lead chars must
    # bail to the generic path; engines must still agree
    text = ("абв abc где def " * 200).encode("koi8_r")
    _both_engines(["-t", "x", "-e", "KOI8-R", "-r"], text)


def test_sbyte_lane_undefined_byte_breaks_window():
    # windows-1252 0x81 is undefined (malformed): cuts the lane
    blk = b"Resum\xe9 caf\xe9 " * 12 + b"\x81"
    _both_engines(["-t", "x", "-e", "windows-1252"], blk * 40)


def test_sbyte_lane_mixed_ascii_highbyte_windows():
    # ascii_fast and sbyte lanes interleave across windows
    a = b"plain ascii text windows here padding "
    c = "чисто кириллические окна здесь " .encode("koi8_r")
    _both_engines(["-t", "x", "-e", "KOI8-R", "-n", "6"], (a + c) * 120)


def test_sbyte_submin_lane_rejected_highbyte_noise():
    # defined-but-rejected byte noise with short accepted runs: the
    # full-256 sub-min window lane's prime shape (KOI8-R accepts
    # Cyrillic; latin noise + controls stay below -n 8)
    rng2 = np.random.default_rng(123)
    data = bytes(rng2.integers(0, 256, 96 * 1024, dtype=np.uint8))
    _both_engines(["-t", "x", "-e", "KOI8-R", "-n", "8"], data)


def test_sbyte_submin_lane_run_exactly_at_min():
    # accepted runs of exactly chars_min MUST emit (the lane bails)
    blk = "жжж".encode("koi8_r") + b"\x00" + "жж".encode("koi8_r") + b"\x00"
    _both_engines(["-t", "x", "-e", "KOI8-R", "-n", "3"], blk * 200)


def test_sbyte_submin_lane_undefined_byte_cut():
    # windows-1252: 0x81 undefined (malformed event) -> multiple calls
    # per window, the lane must bail; short runs either side
    blk = b"ab\x81cd\x81" * 40
    _both_engines(["-t", "x", "-e", "windows-1252", "-n", "5"], blk * 20)


def test_sbyte_submin_lane_tail_run_carries():
    # an accepted run touching the window end must carry as the
    # refilter leftover and complete in the next window
    blk = b"\x00" * 125 + "жжж".encode("koi8_r")  # 128-byte period
    _both_engines(["-t", "x", "-e", "KOI8-R", "-n", "4"], blk * 64)
