"""Resumable scanning: scanning in segments with carried state must be
byte-identical to one continuous scan (native state ABI + checkpoint
serialization)."""

import json

import numpy as np
import pytest

from stringsext_tpu import native
from stringsext_tpu.input import LoadedStream, slice_table
from stringsext_tpu.mission import Missions
from stringsext_tpu.utils import checkpoint

pytestmark = pytest.mark.skipif(native.get_lib() is None, reason="no native toolchain")

rng = np.random.default_rng(23)


def _blob(n=40000):
    data = bytearray(rng.integers(0, 256, size=n, dtype=np.uint8).tobytes())
    for off in range(50, n - 80, 777):
        data[off : off + 26] = b"resumable finding string \xe2"
    return bytes(data)


@pytest.mark.parametrize("enc", ["UTF-8", "utf-16le"])
def test_segmented_scan_equals_whole(enc):
    blob = _blob()
    data = np.frombuffer(blob, np.uint8)
    ms = Missions.new(flag_encoding=[enc], flag_chars_min_nb="4")
    m = ms[0]
    stream = LoadedStream(data, [(1, 0, len(data))])
    sl = slice_table(stream)

    # Whole-stream scan.
    whole, sb_whole = native.native_scan(m, data, *sl)

    # Segmented: split the slice table at an arbitrary boundary and
    # round-trip the state through JSON between the two calls.
    cut = len(sl[0]) // 3
    st = checkpoint.fresh_states(ms)[0]
    parts = []
    bufs = []
    for lo, hi in ((0, cut), (cut, len(sl[0]))):
        seg = tuple(a[lo:hi] for a in sl)
        res, sb = native.native_scan(m, data, *seg, state=st)
        st = json.loads(json.dumps(st))  # serialize round-trip
        parts.append(res)
        bufs.append(sb)

    got_pos = np.concatenate([p["position"] for p in parts])
    np.testing.assert_array_equal(got_pos, whole["position"])
    got_strs = b"".join(bufs)
    assert got_strs == sb_whole
    for field in ("precision", "completes", "file_id", "str_len"):
        np.testing.assert_array_equal(
            np.concatenate([p[field] for p in parts]), whole[field], err_msg=field
        )


def test_checkpoint_file_round_trip(tmp_path):
    ms = Missions.new(flag_encoding=["UTF-8", "ascii"])
    states = checkpoint.fresh_states(ms)
    states[0]["consumed"] = 12345
    states[0]["leftover_cps"] = [104, 105]
    p = str(tmp_path / "ckpt.json")
    checkpoint.save_checkpoint(p, states, next_slice=7)
    d = checkpoint.load_checkpoint(p)
    assert d["next_slice"] == 7
    assert d["missions"][0]["consumed"] == 12345
    assert d["missions"][0]["leftover_cps"] == [104, 105]


def test_checkpoint_rejects_bad_version_and_mission_count(tmp_path):
    """Resume must refuse a checkpoint from a different format version
    or a different -e mission set (silently mixing states would emit
    wrong offsets/continuations)."""
    ms = Missions.new(flag_encoding=["UTF-8", "ascii"])
    p = str(tmp_path / "ckpt.json")
    checkpoint.save_checkpoint(p, checkpoint.fresh_states(ms), next_slice=0)

    # mission-count mismatch
    with pytest.raises(ValueError, match="mission"):
        checkpoint.load_checkpoint(p, expected_missions=3)
    # matching count passes
    assert len(checkpoint.load_checkpoint(p, expected_missions=2)["missions"]) == 2

    # version mismatch
    d = json.loads(open(p).read())
    d["version"] = 99
    open(p, "w").write(json.dumps(d))
    with pytest.raises(ValueError, match="version"):
        checkpoint.load_checkpoint(p)


def test_checkpoint_save_is_atomic(tmp_path):
    """save_checkpoint writes temp+rename: the target never holds a
    partial dump, and a pre-existing good checkpoint survives a
    same-path rewrite."""
    import os

    ms = Missions.new(flag_encoding=["UTF-8"])
    p = str(tmp_path / "ckpt.json")
    checkpoint.save_checkpoint(p, checkpoint.fresh_states(ms), next_slice=1)
    first = open(p).read()
    checkpoint.save_checkpoint(p, checkpoint.fresh_states(ms), next_slice=2)
    assert checkpoint.load_checkpoint(p)["next_slice"] == 2
    assert json.loads(first)["next_slice"] == 1
    # no stray temp files left behind
    assert [f for f in os.listdir(tmp_path) if ".tmp." in f] == []
