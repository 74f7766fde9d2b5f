"""Scan-level behavior: window chunking, carry of leftovers across
slices, split multibyte chars across buffers, min-length suppression.

Scenario parity with /root/reference/src/scanner.rs:91-560 (the
reference shrinks INPUT_BUF_LEN to 0x20 and OUTPUT_BUF_LEN to 0x40 under
test so tiny inputs exercise every boundary path; here the slice length
is explicit, so the tests feed the same small buffers directly).
"""

import numpy as np

from stringsext_tpu.engine.automaton import SliceScanner
from stringsext_tpu.engine.events import generate_events
from stringsext_tpu.finding import PRECISION_AFTER, PRECISION_BEFORE, PRECISION_EXACT
from stringsext_tpu.mission import (
    AF_ALL,
    AF_CTRL,
    AF_WHITESPACE,
    Mission,
    UBF_ALL,
    UBF_INVALID,
    UBF_LATIN,
    Utf8Filter,
)

UTF8_FILTER_ALL_VALID = Utf8Filter(af=AF_ALL, ubf=UBF_ALL & ~UBF_INVALID, grep_char=None)
UTF8_FILTER_LATIN = Utf8Filter(
    af=(AF_ALL & ~AF_CTRL) | AF_WHITESPACE, ubf=UBF_LATIN | 0x3000, grep_char=None
)


def mission(encoding="UTF-8", filt=UTF8_FILTER_ALL_VALID, n=3, q=10, offset=10_000):
    return Mission(
        mission_id=0,
        counter_offset=offset,
        encoding_name=encoding,
        chars_min_nb=n,
        require_same_unicode_block=False,
        filter=filt,
        output_line_char_nb_max=q,
        print_encoding_as_ascii=False,
    )


def scan_buffers(m, buffers, last_flags=None):
    """Feed consecutive buffers through one SliceScanner, like repeated
    FindingCollection::from calls on one ScannerState."""
    stream = np.frombuffer(b"".join(buffers), dtype=np.uint8)
    ev = generate_events(stream, m.encoding_name)
    sc = SliceScanner(m)
    out = []
    pos = 0
    for i, b in enumerate(buffers):
        is_last = last_flags[i] if last_flags else (i == len(buffers) - 1)
        arr = np.frombuffer(b, dtype=np.uint8)
        out.append(sc.scan_slice(arr, pos, ev, 0, is_last))
        pos += len(b)
    return out, sc.state


def test_scan_input_buffer_chunks():
    # scanner.rs:192-221
    m = mission()
    (fc,), st = scan_buffers(m, [b"a234567890b234567890c234"])
    assert [(f.s, f.position, f.position_precision) for f in fc] == [
        (b"a234567890", 10000, PRECISION_EXACT),
        (b"b234567890", 10000, PRECISION_AFTER),
        (b"c234", 10020, PRECISION_EXACT),
    ]
    assert not st.last_printed_maybe_cut
    assert st.consumed_bytes == 10000 + 24


def test_scan_store_in_scanner_state():
    # scanner.rs:223-255
    m = mission()
    (fc,), st = scan_buffers(m, [b"a234567890b234567890c2"])
    assert [(f.s, f.position, f.position_precision) for f in fc] == [
        (b"a234567890", 10000, PRECISION_EXACT),
        (b"b234567890", 10000, PRECISION_AFTER),
        (b"c2", 10020, PRECISION_EXACT),
    ]
    assert not st.last_printed_maybe_cut
    assert st.consumed_bytes == 10000 + 22


def test_split_str_iterator_and_store_in_scanner_state():
    # scanner.rs:257-304
    m = mission()
    (fc1, fc2), st = scan_buffers(
        m, [b"You\xC0\x82\xC0co", b"me\xC0\x82\xC0home."], [False, True]
    )
    assert [(f.s, f.position, f.position_precision) for f in fc1] == [
        (b"You", 10000, PRECISION_EXACT),
    ]
    assert [(f.s, f.position, f.position_precision) for f in fc2] == [
        (b"come", 10008, PRECISION_BEFORE),
        (b"home.", 10013, PRECISION_EXACT),
    ]
    assert st.leftover_cps == []
    assert st.consumed_bytes == 10008 + 10


def test_grep_in_scan():
    # scanner.rs:306-350
    f = Utf8Filter(af=(AF_ALL & ~AF_CTRL) | AF_WHITESPACE, ubf=UBF_LATIN, grep_char=42)
    m = mission(filt=f)
    (fc1, fc2), st = scan_buffers(
        m, [b"You\xC0\x82\xC0co", b"me*\xC0\x82\xC0ho*me.\x82"], [False, True]
    )
    assert fc1 == []
    assert [(f_.s, f_.position, f_.position_precision) for f_ in fc2] == [
        (b"come*", 10008, PRECISION_BEFORE),
        (b"ho*me.", 10014, PRECISION_EXACT),
    ]
    assert st.leftover_cps == []
    assert st.consumed_bytes == 10008 + 13


def test_scan_buffer_split_multibyte():
    # scanner.rs:352-412: a multi-byte char split between two runs.
    m = mission()
    (fc1, fc2, fc3), st = scan_buffers(
        m,
        [b"word\xe2\x82", b"\xacoh\xC0no no", b"\xe2\x82\xacStream end."],
        [False, False, True],
    )
    assert [(f.s, f.position, f.position_precision) for f in fc2] == [
        ("word€oh".encode(), 10006, PRECISION_BEFORE),
    ]
    assert [(f.s, f.position, f.position_precision) for f in fc3] == [
        ("no no€Stre".encode(), 10015, PRECISION_BEFORE),
        (b"am end.", 10015, PRECISION_AFTER),
    ]
    assert st.consumed_bytes == 10015 + 14


def test_too_short1():
    # scanner.rs:414-470
    m = mission()
    (fc1, fc2), st = scan_buffers(
        m, [b"ii\xC0abc\xC0\xC1de\xC0fgh\xC0ijk", b"b\xC0\x82c\xC0def"], [False, True]
    )
    assert [(f.s, f.position, f.position_precision) for f in fc1] == [
        (b"abc", 10003, PRECISION_EXACT),
        (b"fgh", 10011, PRECISION_EXACT),
    ]
    assert [(f.s, f.position, f.position_precision) for f in fc2] == [
        (b"ijkb", 10018, PRECISION_BEFORE),
        (b"def", 10023, PRECISION_EXACT),
    ]
    assert st.consumed_bytes == 10018 + 8
    assert st.leftover_cps == []


def test_too_short2():
    # scanner.rs:472-531
    m = mission(filt=UTF8_FILTER_LATIN)
    (fc1, fc2), st = scan_buffers(
        m, ["ii€ääà€€de€fgh€ijk".encode(), b"b\xC0\x82c\xC0def"], [False, True]
    )
    assert [(f.s, f.position, f.position_precision) for f in fc1] == [
        ("ääà".encode(), 10000, PRECISION_EXACT),
        (b"fgh", 10020, PRECISION_BEFORE),
    ]
    assert [(f.s, f.position, f.position_precision) for f in fc2] == [
        (b"ijkb", 10031, PRECISION_BEFORE),
        (b"def", 10036, PRECISION_EXACT),
    ]
    assert st.consumed_bytes == 10031 + 8


def test_field_with_zeros():
    # scanner.rs:533-559: regression - zero bytes must not produce a
    # spurious finding.
    m = mission(filt=UTF8_FILTER_LATIN, n=4, q=60)
    (fc,), _ = scan_buffers(
        m,
        [b"\x00\x00\x00\x00\x40\x00\x38\x00\x0c\x00\x40\x00\x2c\x00\x2b\x00"],
        [False],
    )
    assert len(fc) != 1


def test_ascii_emulation():
    # finding_collection.rs:430-502
    m = mission(encoding="x-user-defined")
    (fc,), st = scan_buffers(m, [b"abcdefg\x58\x59\x80\x82h\x83ijk\x89\x90"], [True])
    assert [(f.s, f.position, f.position_precision) for f in fc] == [
        ("abcdefgXY\uf780".encode(), 10000, PRECISION_EXACT),
        ("\uf782h\uf783ijk\uf789\uf790".encode(), 10000, PRECISION_AFTER),
    ]
    assert st.consumed_bytes == 10000 + 18
    assert not st.last_printed_maybe_cut
    assert st.leftover_cps == []

    f = Utf8Filter(af=(AF_ALL & ~AF_CTRL) | AF_WHITESPACE, ubf=0, grep_char=None)
    m = mission(encoding="x-user-defined", filt=f)
    (fc,), st = scan_buffers(m, [b"abcdefg\x58\x59\x80\x82h\x83ijk\x89\x90"], [False])
    assert [(f_.s, f_.position, f_.position_precision) for f_ in fc] == [
        (b"abcdefgXY", 10000, PRECISION_EXACT),
        (b"ijk", 10000, PRECISION_AFTER),
    ]
    assert st.consumed_bytes == 10000 + 18
