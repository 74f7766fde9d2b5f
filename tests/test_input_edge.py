"""Input-layer and counter edge parity (review round 5).

Three divergences a source-level comparison against the reference
found and fixed:

1. Non-regular inputs (FIFOs, procfs/sysfs, char devices) report a
   zero or stale st_size; the reference's Read-based Slicer
   (input.rs:120-129) read()-loops and scans their content, so the
   stat-size fast path must fall back to a read()-to-EOF loop -
   previously the content was silently dropped and every later
   file's positions shifted.
2. The reference's ByteCounter is u64 (input.rs:16) and wraps mod
   2^64 in release Rust when -s pushes it past the max; the pure-
   Python engine carried unbounded ints and crashed with
   OverflowError instead of printing the wrapped position.
3. The reference truncates mission_id to u8 at construction
   (mission.rs:697) and merges on the wrapped value (finding.rs:
   92-109); the port compared the unwrapped id.
"""

import io
import os
import threading

import numpy as np

from stringsext_tpu.cli import parse_args
from stringsext_tpu.input import load_stream
from stringsext_tpu.run import run


def test_fifo_input_is_scanned(tmp_path, monkeypatch):
    monkeypatch.setenv("STRINGSEXT_DEVICE_PROBE", "0")
    f1 = tmp_path / "a.bin"
    f1.write_bytes(b"file1str\x00")
    fifo = tmp_path / "pipe"
    os.mkfifo(fifo)
    payload = b"FifoString\x00"

    def writer():
        with open(fifo, "wb") as w:
            w.write(payload)

    t = threading.Thread(target=writer)
    t.start()
    try:
        stream = load_stream([str(f1), str(fifo)])
    finally:
        t.join()
    assert bytes(stream.data) == b"file1str\x00" + payload
    assert stream.spans == [(1, 0, 9), (2, 9, 9 + len(payload))]

    # end-to-end: the FIFO's string prints with the right file letter
    # and the right absolute position (after file 1's 9 bytes)
    os.mkfifo(tmp_path / "pipe2")
    t = threading.Thread(
        target=lambda: open(tmp_path / "pipe2", "wb").write(payload))
    t.start()
    buf = io.BytesIO()
    try:
        rc = run(parse_args(
            ["-t", "x", "-e", "ascii",
             str(f1), str(tmp_path / "pipe2")]), out=buf, engine="python")
    finally:
        t.join()
    assert rc == 0
    out = buf.getvalue()
    assert b"A  0 \tfile1str" in out
    assert b"B  9 \tFifoString" in out


def test_procfs_zero_stat_size_input():
    if not os.path.exists("/proc/version"):
        return  # non-Linux
    stream = load_stream(["/proc/version"])
    assert len(stream.data) > 0
    assert b"Linux" in bytes(stream.data)


def test_grown_file_extra_bytes_are_picked_up(tmp_path, monkeypatch):
    """The read()-after-readinto catch-up path: lie about st_size via
    a monkeypatched stat so the preallocation is short."""
    f1 = tmp_path / "g.bin"
    f1.write_bytes(b"0123456789ABCDEF")
    real_stat = os.stat

    def short_stat(p, *a, **k):
        st = real_stat(p, *a, **k)
        if str(p) == str(f1):
            class S:
                st_mode = st.st_mode
                st_size = 8
            return S()
        return st

    monkeypatch.setattr(os, "stat", short_stat)
    f2 = tmp_path / "h.bin"
    f2.write_bytes(b"tail")
    stream = load_stream([str(f1), str(f2)])
    assert bytes(stream.data) == b"0123456789ABCDEFtail"
    assert stream.spans == [(1, 0, 16), (2, 16, 20)]


def test_u64_counter_wrap_matches_native(tmp_path, monkeypatch):
    monkeypatch.setenv("STRINGSEXT_DEVICE_PROBE", "0")
    p = tmp_path / "w.bin"
    p.write_bytes(b"ABCDEFGHIJKLMNOP\xffWrapTest\x00")
    # UTF-8: 0xFF is a hard error, so the next decode call starts at
    # slice offset 17 = counter 0xFFFFFFFFFFFFFFF0 + 17 = 1 mod 2^64
    argv = ["-t", "x", "-s", "0xFFFFFFFFFFFFFFF0", "-e", "UTF-8", str(p)]
    outs = {}
    for eng in ("python", "auto"):
        buf = io.BytesIO()
        assert run(parse_args(argv), out=buf, engine=eng) == 0
        outs[eng] = buf.getvalue()
    assert outs["python"] == outs["auto"]
    # 0xFFFFFFFFFFFFFFF0 + 17 wraps to 1
    assert b"\n 1 \tWrapTest" in outs["python"]
    assert b"fffffffffffffff0" in outs["python"]  # first run unwrapped


def test_sort_key_wraps_mission_id_to_u8():
    from stringsext_tpu.finding import Finding, PRECISION_EXACT
    from stringsext_tpu.mission import Missions

    args = parse_args(["-e", "UTF-8", "-e", "ascii", "x"])
    ms = Missions.from_args(args)
    m1, m2 = ms.v[0], ms.v[1]
    object.__setattr__(m1, "mission_id", 1)
    object.__setattr__(m2, "mission_id", 256)  # wraps to 0 in the ref

    def f(m):
        return Finding(input_file_id=1, mission=m, position=7,
                       position_precision=PRECISION_EXACT, s=b"x",
                       s_completes_previous_s=False)

    assert f(m2).sort_key() < f(m1).sort_key()
