"""Differential sweep over ALL supported encodings: the native C++
engine must be byte-identical to the pure-Python oracle for every
encoding on a mixed binary corpus (the fuzzer samples a 16-encoding
subset; this pins the full matrix, one mission at a time)."""

import io

import numpy as np
import pytest

from stringsext_tpu.cli import parse_args
from stringsext_tpu.encodings import ALL_ENCODING_NAMES
from stringsext_tpu.run import run


def _corpus():
    rng = np.random.default_rng(99)
    blob = bytearray(rng.integers(0, 256, 131072, np.uint8).tobytes())
    blob[9000:17000] = b"\x00" * 8000
    plants = [
        ("utf-8", "déjà €uro мир 汉字"),
        ("utf-16-le", "wide строка"),
        ("cp932", "日本語テスト"),
        ("gb18030", "中文测试\U00020000"),
        ("cp949", "한국어"),
        ("big5", "中文字元"),
        ("iso2022_jp", "日本語"),
        ("koi8_r", "Русский текст КОИ8"),
        ("cp1252", "Latin-1 naïve café"),
    ]
    off = 20000
    for codec, text in plants:
        t = text.encode(codec, errors="ignore")
        blob[off : off + len(t)] = t
        off += len(t) + 777
    return bytes(blob)


@pytest.fixture(scope="module")
def corpus_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("alldiff") / "mix.bin"
    p.write_bytes(_corpus())
    return str(p)


@pytest.mark.parametrize("enc", ["ascii"] + list(ALL_ENCODING_NAMES))
def test_native_matches_python(enc, corpus_file):
    argv = ["-t", "x", "-n", "5", "-e", enc, corpus_file]
    outs = {}
    for engine in ("python", "auto"):
        buf = io.BytesIO()
        run(parse_args(argv), out=buf, engine=engine)
        outs[engine] = buf.getvalue()
    assert outs["auto"] == outs["python"], enc
