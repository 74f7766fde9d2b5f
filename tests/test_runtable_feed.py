"""Device run-table feed (STRINGSEXT_RUNTABLE_FEED=1): the emitter
consumes EXACT device-extracted accepted runs plus the device-decoded
UTF-8 payload (docs/KERNELS.md design 1 - the on-device analog of the
reference's decode loop, finding_collection.rs:84-342). Interpret-mode
differential pins byte-identity; a corrupted-payload probe proves the
fast lane actually consumes the payload (not silently falling back).
"""

import io
import os

import numpy as np
import pytest

from stringsext_tpu import native
from stringsext_tpu.cli import parse_args
from stringsext_tpu.input import LoadedStream, slice_table
from stringsext_tpu.mission import Missions
from stringsext_tpu.ops.device_events import _utf8_encode_cps, runtable_feed
from stringsext_tpu.run import run

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="no native toolchain"
)

rng = np.random.default_rng(21)


def _corpus(n=256 * 1024):
    data = bytearray(rng.integers(0, 256, n, np.uint8).tobytes())
    text = "в лесу родилась ёлочка, в лесу она росла ".encode("koi8_r")
    long_run = text * 30  # >> one 2q window: full in-run windows exist
    for off in range(2048, n - len(long_run) - 64, 16384):
        data[off : off + len(long_run)] = long_run
    # short runs, runs cut by undefined/rejected bytes, window-edge runs
    for off in range(1024, n - 256, 7000):
        data[off : off + 3] = "да!".encode("koi8_r")
    return bytes(data)


def test_utf8_encode_cps_matches_python():
    cps = np.array(
        [0x41, 0x7F, 0x80, 0x7FF, 0x800, 0x2126, 0xFFFD, 0x451], np.int32
    )
    pay, co = _utf8_encode_cps(cps)
    expect = "".join(chr(c) for c in cps).encode("utf-8")
    assert pay.tobytes() == expect
    offs = np.cumsum([0] + [len(chr(c).encode()) for c in cps])
    assert np.array_equal(co, offs)


def test_feed_builder_matches_oracle():
    """Runs are exactly the maximal accepted-char runs; the payload is
    the concatenated UTF-8 of the accepted chars."""
    blob = _corpus(64 * 1024)
    argv = ["-t", "x", "-e", "KOI8-R", "-n", "4", "/dev/null"]
    m = Missions.from_args(parse_args(argv)).v[0]
    data = np.frombuffer(blob, np.uint8)
    feed = runtable_feed(data, m)
    assert feed is not None
    rs, re, cb, co, pay = feed
    # oracle accept mask from the decode table + filters
    from stringsext_tpu.encodings import full_byte_table

    tbl = full_byte_table(m.encoding_name)
    cp = tbl[data]
    f = m.filter
    acc = np.zeros(len(data), bool)
    for b in range(256):
        c = int(tbl[b])
        if c < 0:
            continue
        if c < 0x80:
            ok = bool((f.af >> c) & 1)
        else:
            lead = 0xC0 | (c >> 6) if c < 0x800 else 0xE0 | (c >> 12)
            ok = bool((f.ubf >> (lead & 0x3F)) & 1)
        if ok:
            acc |= data == b
    d = np.diff(acc.astype(np.int8), prepend=0, append=0)
    assert np.array_equal(rs, np.flatnonzero(d == 1))
    assert np.array_equal(re, np.flatnonzero(d == -1))
    expect_pay = "".join(chr(c) for c in cp[acc]).encode("utf-8")
    assert pay.tobytes() == expect_pay


@pytest.mark.parametrize("argv_extra", [
    ["-e", "KOI8-R"],
    ["-e", "KOI8-R", "-e", "UTF-8"],
    ["-e", "KOI8-R", "-q", "10"],  # small windows: many edge cases
    ["-e", "windows-1252", "-e", "KOI8-R", "-n", "6"],
])
def test_feed_end_to_end_byte_identical(tmp_path, monkeypatch, argv_extra):
    p = tmp_path / "feed.bin"
    p.write_bytes(_corpus())
    argv = ["-t", "x", "-n", "4"] + argv_extra + [str(p)]
    buf_a = io.BytesIO()
    assert run(parse_args(argv), out=buf_a, engine="auto") == 0
    monkeypatch.setenv("STRINGSEXT_RUNTABLE_FEED", "1")
    buf_t = io.BytesIO()
    assert run(parse_args(argv), out=buf_t, engine="tpu") == 0
    assert buf_t.getvalue() == buf_a.getvalue()
    assert buf_a.getvalue().count(b"\n") > 100  # real findings


def test_feed_lane_actually_consumes_payload(tmp_path):
    """Engagement proof: scanning with a CORRUPTED payload must change
    the output (the lane read it), and with the intact payload must
    equal the no-feed scan byte-for-byte."""
    blob = _corpus(128 * 1024)
    argv = ["-t", "x", "-e", "KOI8-R", "-n", "4", "/dev/null"]
    m = Missions.from_args(parse_args(argv)).v[0]
    data = np.frombuffer(blob, np.uint8)
    stream = LoadedStream(data, [(1, 0, len(data))])
    sl = slice_table(stream)
    feed = runtable_feed(data, m)
    assert feed is not None and len(feed[0]) > 10

    def scan(fd):
        res, sb = native.native_scan(m, data, *sl, runtable_feed=fd)
        return {k: np.asarray(v).copy() for k, v in res.items()}, bytes(sb)

    base_res, base_sb = scan(None)
    feed_res, feed_sb = scan(feed)
    assert base_sb == feed_sb
    for k in base_res:
        assert np.array_equal(base_res[k], feed_res[k]), k

    corrupt = list(feed)
    corrupt[4] = feed[4] ^ np.uint8(0x01)  # flip payload bits
    _res, bad_sb = scan(tuple(corrupt))
    assert bad_sb != base_sb, (
        "corrupted payload produced identical output - the feed lane "
        "never engaged"
    )


def test_feed_host_builder_matches_device():
    """runtable_feed(device=False) - the jax-free builder the ASan fuzz
    drives the C lane with - must produce arrays identical to the
    device-lanes builder."""
    blob = _corpus(64 * 1024)
    argv = ["-t", "x", "-e", "KOI8-R", "-n", "4", "/dev/null"]
    m = Missions.from_args(parse_args(argv)).v[0]
    data = np.frombuffer(blob, np.uint8)
    dev = runtable_feed(data, m, device=True)
    host = runtable_feed(data, m, device=False)
    assert dev is not None and host is not None
    for a, b in zip(dev, host):
        assert np.array_equal(a, b)
