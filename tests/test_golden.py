"""Conformance: bit-identical output vs. the reference golden corpus.

Mirrors /root/reference/tests/functional/run-tests:10-41 (three CLI
configurations diffed against checked-in expected outputs).
"""

import io

from stringsext_tpu.cli import parse_args
from stringsext_tpu.run import run


def _run_cli(argv):
    args = parse_args(argv)
    buf = io.BytesIO()
    rc = run(args, out=buf)
    assert rc == 0
    return buf.getvalue()


def test_golden_1(golden_dir):
    out = _run_cli(
        [
            "-q", "16", "-g", "63", "-tx", "-a", "All-Ctrl", "-u", "Common",
            "-e", "UTF-8", "-e", "utf-16le", "-e", "utf-16be",
            str(golden_dir / "input1"),
        ]
    )
    assert out == (golden_dir / "expected_output1").read_bytes()


def test_golden_2(golden_dir):
    out = _run_cli(
        [
            "-n", "10", "-q", "32", "-g", "58", "-tx", "-a", "All-Ctrl",
            "-u", "Common", "-e", "UTF-8", "-e", "utf-16le", "-e", "utf-16be",
            str(golden_dir / "input1"), str(golden_dir / "input2"),
        ]
    )
    assert out == (golden_dir / "expected_output2").read_bytes()


def test_golden_3(golden_dir):
    out = _run_cli(
        [
            "-q", "32", "-tx", "-a", "None", "-u", "None",
            "-e", "UTF-8", "-e", "utf-16le", "-e", "utf-16be",
            str(golden_dir / "input1"), str(golden_dir / "input2"),
        ]
    )
    assert out == (golden_dir / "expected_output3").read_bytes()
