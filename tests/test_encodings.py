"""Coverage of all 41 supported encodings (help.rs:54-96).

For each encoding: encode known text with Python's codecs, generate
events, and check the decoded char stream round-trips. Scan-level tests
then verify the full pipeline extracts the text.
"""

import numpy as np
import pytest

from stringsext_tpu.encodings import (
    ALL_ENCODING_NAMES,
    encoding_for_label,
    encoding_kind,
)
from stringsext_tpu.engine.events import generate_events
from stringsext_tpu.mission import Missions
from stringsext_tpu.run import scan_stream
from stringsext_tpu.input import LoadedStream

# Python codec to produce test bytes for each encoding (encode side).
ENCODE_CODEC = {
    "Big5": "big5hkscs",
    "EUC-JP": "euc_jp",
    "EUC-KR": "cp949",
    "GBK": "gb18030",
    "IBM866": "cp866",
    "ISO-2022-JP": "iso2022_jp",
    "ISO-8859-10": "iso8859_10",
    "ISO-8859-13": "iso8859_13",
    "ISO-8859-14": "iso8859_14",
    "ISO-8859-15": "iso8859_15",
    "ISO-8859-16": "iso8859_16",
    "ISO-8859-2": "iso8859_2",
    "ISO-8859-3": "iso8859_3",
    "ISO-8859-4": "iso8859_4",
    "ISO-8859-5": "iso8859_5",
    "ISO-8859-6": "iso8859_6",
    "ISO-8859-7": "iso8859_7",
    "ISO-8859-8": "iso8859_8",
    "ISO-8859-8-I": "iso8859_8",
    "KOI8-R": "koi8_r",
    "KOI8-U": "koi8_u",
    "Shift_JIS": "cp932",
    "UTF-16BE": "utf-16-be",
    "UTF-16LE": "utf-16-le",
    "UTF-8": "utf-8",
    "gb18030": "gb18030",
    "macintosh": "mac_roman",
    "windows-1250": "cp1250",
    "windows-1251": "cp1251",
    "windows-1252": "cp1252",
    "windows-1253": "cp1253",
    "windows-1254": "cp1254",
    "windows-1255": "cp1255",
    "windows-1256": "cp1256",
    "windows-1257": "cp1257",
    "windows-1258": "cp1258",
    "windows-874": "cp874",
    "x-mac-cyrillic": "mac_cyrillic",
}

SAMPLE = {
    "Big5": "中文字元測試與漢字",
    "EUC-JP": "日本語のテスト、漢字とカタカナ",
    "EUC-KR": "한국어 테스트 문자열",
    "GBK": "中文测试字符串和汉字",
    "gb18030": "中文测试é\U00020000字符",
    "IBM866": "Русский текст",
    "ISO-2022-JP": "Hello 日本語 World",
    "ISO-8859-5": "Русский текст",
    "ISO-8859-7": "Ελληνικά κείμενο",
    "KOI8-R": "Русский текст",
    "KOI8-U": "Українська мова",
    "Shift_JIS": "日本語のテストと半角ｶﾀｶﾅ",
    "UTF-16BE": "Hello, 世界! astral: \U0001F600 end",
    "UTF-16LE": "Hello, 世界! astral: \U0001F600 end",
    "UTF-8": "Héllo, 世界! astral: \U0001F600 end",
    "windows-1251": "Русский текст",
    "windows-1252": "Français, déjà vu",
    "windows-874": "ภาษาไทย",
    "x-mac-cyrillic": "Русский текст",
}
DEFAULT_SAMPLE = "The quick brown fox: déjà vu"


def _sample_for(name):
    text = SAMPLE.get(name, DEFAULT_SAMPLE)
    codec = ENCODE_CODEC[name]
    try:
        return text, text.encode(codec)
    except UnicodeEncodeError:
        text = "plain ascii only 123"
        return text, text.encode(codec)


@pytest.mark.parametrize("name", [n for n in ALL_ENCODING_NAMES
                                  if n not in ("replacement", "x-user-defined")])
def test_event_round_trip(name):
    text, raw = _sample_for(name)
    ev = generate_events(np.frombuffer(raw, np.uint8), name)
    decoded = "".join(chr(c) for c in ev.cp if c >= 0)
    # ISO-2022-JP escape transitions are not chars; everything else must
    # round-trip exactly.
    assert decoded == text, f"{name}: {decoded!r} != {text!r}"
    # no malformed events on pure valid input
    assert (ev.cp >= 0).all(), f"{name} produced malformed events"


@pytest.mark.parametrize("name", [n for n in ALL_ENCODING_NAMES if n != "replacement"])
def test_tiny_streams(name):
    """0-5 byte streams must classify without errors (regression: the
    CJK classifiers built negative-size lookahead masks for n < 4)."""
    probes = [b"", b"\xa1", b"\xa1\xa2", b"\x8f\xa1", b"\x1b$", b"A\xff\xfe\x00\x41"]
    for blob in probes:
        for n in range(len(blob) + 1):
            ev = generate_events(np.frombuffer(blob[:n], np.uint8), name)
            assert (np.diff(ev.report) >= 0).all() if len(ev) > 1 else True


def test_replacement_yields_nothing():
    ev = generate_events(np.frombuffer(b"anything at all", np.uint8), "replacement")
    assert (ev.cp < 0).all()


def test_label_table_covers_all():
    for name in ALL_ENCODING_NAMES:
        assert encoding_for_label(name) == name
        encoding_kind(name)  # must not raise


@pytest.mark.parametrize("enc_label,text", [
    ("big5", "中文字元測試"),
    ("euc-kr", "한국어 테스트"),
    ("shift_jis", "日本語のテスト"),
    ("gb18030", "中文测试字符串"),
    ("euc-jp", "日本語のテスト"),
    ("iso-2022-jp", "Hello 日本語 end!"),
    ("koi8-r", "Русский текст тест"),
    ("windows-1252", "Français, déjà vu"),
])
def test_scan_extracts_text(enc_label, text):
    """Full-pipeline: binary garbage around encoded text; the scan must
    find the text."""
    name = encoding_for_label(enc_label)
    raw = text.encode(ENCODE_CODEC[name])
    blob = b"\x00\x01\x02\xfe\xff" * 4 + raw + b"\x00\xff\x03" * 4
    # Note: "-u All" would prefix-match the "All-Asian" alias first
    # (mission.rs:475-504 table-order quirk, reproduced faithfully), so
    # use "Default" which passes all valid multibyte UTF-8.
    ms = Missions.new(
        flag_encoding=[enc_label], flag_chars_min_nb="4",
        flag_unicode_block_filter="Default",
    )
    stream = LoadedStream(np.frombuffer(blob, np.uint8), [(1, 0, len(blob))])
    findings = scan_stream(stream, ms)
    joined = "".join(f.s.decode() for f in findings)
    assert text in joined, f"{enc_label}: {joined!r}"


def test_whatwg_index_overrides():
    """encoding_rs uses the WHATWG indexes, which diverge from Python's
    codecs in two places: index-koi8-u is the KOI8-RU variant
    (0xAE/0xBE are Cyrillic short U) and index-windows-1255 defines
    0xCA (HOLAM HASER FOR VAV) where cp1255 has a hole."""
    from stringsext_tpu.encodings import single_byte_table

    t = single_byte_table("KOI8-U")
    assert t[0xAE - 0x80] == 0x045E and t[0xBE - 0x80] == 0x040E
    assert single_byte_table("windows-1255")[0xCA - 0x80] == 0x05BA


def test_iso2022_output_flag_clears_on_error_bytes():
    """WHATWG: every consumed data-state byte unsets the ISO-2022-JP
    output flag, error bytes included, so escapes separated only by
    error bytes are silent transitions; adjacent escapes still error."""
    import numpy as np

    from stringsext_tpu.engine.events_iso2022 import generate

    sep = b"\x1b(B" + b"\x80" + b"\x1b$B" + "日本".encode("iso2022_jp")[3:-3]
    ev = generate(np.frombuffer(sep, np.uint8))
    assert not any(
        l == 3 and cp < 0
        for l, cp in zip(ev.in_len.tolist(), ev.cp.tolist())
    )
    adj = b"\x1b(B\x1b(B a"
    ev2 = generate(np.frombuffer(adj, np.uint8))
    assert any(
        l == 3 and cp < 0
        for l, cp in zip(ev2.in_len.tolist(), ev2.cp.tolist())
    )
