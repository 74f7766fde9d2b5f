"""The native C++ line formatter (emitter.cpp se_format) and the
Python fallback loop in run.write_output must be byte-identical across
every metadata combination (finding.rs:112-155 grammar)."""

import io
import os

import numpy as np
import pytest

from stringsext_tpu.cli import parse_args
from stringsext_tpu.run import run


def _corpus(tmp_path, k):
    rng = np.random.default_rng(k)
    data = bytearray(rng.integers(0, 256, 20000, np.uint8).tobytes())
    msgs = [
        "Déjà vu €uro text?".encode("utf-8"),
        "Wide Кириллица?".encode("utf-16-le"),
        b"plain ascii string?",
    ]
    for j, m in enumerate(msgs):
        off = 1000 + j * 5000
        data[off : off + len(m)] = m
    p = tmp_path / f"c{k}.bin"
    p.write_bytes(bytes(data))
    return str(p)


@pytest.mark.parametrize(
    "extra",
    [
        ["-t", "x"],
        ["-t", "d"],
        ["-t", "o"],
        [],  # no radix: no position column
        ["-t", "x", "-c"],  # no metadata at all
        ["-t", "x", "-g", "63"],
        ["-t", "d", "-n", "2", "-q", "10"],
    ],
)
@pytest.mark.parametrize("nfiles", [1, 2])
def test_native_format_matches_python(tmp_path, extra, nfiles):
    from stringsext_tpu import native

    if native.get_lib() is None:
        pytest.skip("no native lib")
    paths = [_corpus(tmp_path, k) for k in range(nfiles)]
    argv = ["-e", "UTF-8", "-e", "utf-16le", *extra, *paths]
    outs = {}
    for mode in ("1", "0"):
        os.environ["STRINGSEXT_NATIVE_FORMAT"] = mode
        try:
            args = parse_args(argv)
            buf = io.BytesIO()
            run(args, out=buf, engine="native")
            outs[mode] = buf.getvalue()
        finally:
            del os.environ["STRINGSEXT_NATIVE_FORMAT"]
    assert outs["1"] == outs["0"]
    assert len(outs["1"]) > 10  # sanity: findings were produced


def test_slab_parallel_merge_matches_fused(tmp_path, monkeypatch):
    """The slab-parallel merge renderer (se_merge_buf slabs written in
    order) must be byte-identical to the single fused se_merge_fd pass:
    every stream is cut at the same position values, so all (position,
    mission_id) ties stay within one slab."""
    import numpy as np

    from stringsext_tpu import native
    from stringsext_tpu import run as R
    from stringsext_tpu.cli import parse_args
    from stringsext_tpu.input import LoadedStream
    from stringsext_tpu.mission import Missions

    if native.get_lib() is None:
        pytest.skip("no native lib")
    rng = np.random.default_rng(11)
    data = rng.integers(0, 256, size=1 << 20, dtype=np.uint8)
    msg = b"slab test string payload! "
    wmsg = "Жѝ wide slab".encode("utf-16-le")
    for off in range(64, (1 << 20) - 64, 160):
        m = msg if (off // 160) % 2 else wmsg
        data[off : off + len(m)] = np.frombuffer(m, np.uint8)

    argv = ["-t", "x", "-e", "UTF-8", "-e", "utf-16le", "-n", "4", "--",
            "/tmp/x"]
    args = parse_args(argv)
    missions = Missions.from_args(args)
    stream = LoadedStream(data, [(None, 0, len(data))])
    results = R._scan_arrays(stream, missions, "auto")
    n_tot = sum(len(r[1]["position"]) for r in results)
    monkeypatch.setattr(native, "_SLAB_ROWS", 512)
    assert n_tot > 8 * native._SLAB_ROWS  # enough rows for many slabs

    outs = {}
    for w in ("1", "4", "16"):
        monkeypatch.setenv("STRINGSEXT_MERGE_WORKERS", w)
        p = tmp_path / f"out{w}.bin"
        with open(p, "wb") as f:
            R._emit_lines(f, args, results)
        outs[w] = p.read_bytes()
    assert outs["1"] == outs["4"] == outs["16"]
    assert len(outs["1"]) > 100_000  # sanity: dense output


def test_format_batching_matches_single_payload(monkeypatch):
    """The bounded-memory batched formatter (N findings per payload)
    must write the same byte stream as one big payload."""
    import io

    import numpy as np

    from stringsext_tpu import run as R
    from stringsext_tpu.cli import parse_args
    from stringsext_tpu.input import LoadedStream
    from stringsext_tpu.mission import Missions

    rng = np.random.default_rng(5)
    data = rng.integers(0, 256, size=65536, dtype=np.uint8)
    msg = b"Batching test string! "
    for off in range(100, 60000, 700):
        data[off : off + len(msg)] = np.frombuffer(msg, np.uint8)

    argv = ["-t", "x", "-e", "UTF-8", "-e", "utf-16le", "--", "/tmp/x"]
    args = parse_args(argv)
    missions = Missions.from_args(args)
    stream = LoadedStream(data, [(None, 0, len(data))])
    results = R._scan_arrays(stream, missions, "auto")
    assert sum(len(r[1]["position"]) for r in results) > 10

    big = io.BytesIO()
    R._emit_lines(big, args, results)

    monkeypatch.setattr(R, "_FORMAT_BATCH", 7)
    small = io.BytesIO()
    R._emit_lines(small, args, results)
    assert big.getvalue() == small.getvalue()
