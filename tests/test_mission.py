"""Mission / filter parsing.

Scenario parity with /root/reference/src/mission.rs:752-854 and
/root/reference/src/options.rs:121-178.
"""

import pytest

from stringsext_tpu.mission import (
    AF_ALL,
    AF_DEFAULT,
    MissionError,
    Missions,
    UBF_ACCENTS,
    UBF_LATIN,
    Utf8Filter,
    parse_enc_opt,
)


def test_pass_filter():
    # mission.rs:757-774
    f = Utf8Filter(af=AF_ALL, ubf=UBF_LATIN, grep_char=None)
    assert f.pass_af_filter(ord("A"))
    # first byte of (c) U+00A9 in UTF-8 is 0xC2
    assert f.pass_ubf_filter(0xC2)
    # first byte of Euro U+20AC in UTF-8 is 0xE2
    assert not f.pass_ubf_filter(0xE2)


def test_enc_opt_parser():
    # mission.rs:776-853
    assert parse_enc_opt("ascii") == ("ascii", None, None, None, None)
    assert parse_enc_opt("utf-8,10,0x89AB,0xCDEF,0x2f") == (
        "utf-8", 10, 0x89AB, 0xCDEF, 0x2F,
    )
    assert parse_enc_opt("utf-8,10,0x89AB,0xCDEF,211") == (
        "utf-8", 10, 0x89AB, 0xCDEF, 211,
    )
    assert parse_enc_opt(",,,,,") == (None, None, None, None, None)
    assert parse_enc_opt("ascii,10,0x89AB") == ("ascii", 10, 0x89AB, None, None)

    for bad in [
        "ascii, 10n",
        "ascii,10,0x89,0x?B",
        "ascii,10,0x?9,0xAB",
        "ascii,1000000000000000000000,0x1,0x2",
        "ascii,10,0x1,0x2,0x3,0x4",
        "ascii,10,123",
        "ascii,10,,123",
        "ascii,10,my-no-encoding",
        "ascii,10,,my-no-encoding",
    ]:
        with pytest.raises(MissionError):
            parse_enc_opt(bad)

    assert parse_enc_opt("ascii,10,Default") == ("ascii", 10, AF_DEFAULT, None, None)
    assert parse_enc_opt("ascii,10,,Latin") == (
        "ascii", 10, None, UBF_LATIN | UBF_ACCENTS, None,
    )


def test_missions_ascii_emulation():
    # mission.rs:623-679: "ascii" -> x-user-defined + ascii default filter.
    ms = Missions.new(flag_encoding=["ascii", "utf-8"])
    assert ms[0].encoding_name == "x-user-defined"
    assert ms[0].print_encoding_as_ascii
    assert ms[0].display_encoding_name == "ascii"
    assert ms[0].filter.ubf == 0
    assert ms[1].encoding_name == "UTF-8"
    assert not ms[1].print_encoding_as_ascii


def test_missions_defaults():
    ms = Missions.new()
    assert len(ms) == 1
    assert ms[0].encoding_name == "UTF-8"
    assert ms[0].chars_min_nb == 4
    assert ms[0].output_line_char_nb_max == 64
    assert ms[0].counter_offset == 0


def test_missions_validation():
    with pytest.raises(MissionError):
        Missions.new(flag_grep_char="200")
    with pytest.raises(MissionError):
        Missions.new(flag_output_line_len="5")
    with pytest.raises(MissionError):
        Missions.new(flag_encoding=["no-such-encoding"])
    # per-encoding grep > 127 rejected too
    with pytest.raises(MissionError):
        Missions.new(flag_encoding=["utf-8,4,,,200"])


def test_label_resolution():
    ms = Missions.new(flag_encoding=["UTF-8", "utf8", "Latin1", "euc-kr"])
    assert ms[0].encoding_name == "UTF-8"
    assert ms[1].encoding_name == "UTF-8"
    assert ms[2].encoding_name == "windows-1252"
    assert ms[3].encoding_name == "EUC-KR"
