"""SplitStr filter-iterator behavior.

Scenario parity with /root/reference/src/helper.rs:463-832 (splitting,
boundary flags, same-unicode-block, grep-char corner cases), re-expressed
against the codepoint-based `split_str` generator.
"""

from stringsext_tpu.engine.automaton import split_str
from stringsext_tpu.mission import AF_ALL, UBF_GREEK, UBF_LATIN, UBF_NONE, Utf8Filter

LATIN = Utf8Filter(af=AF_ALL, ubf=UBF_LATIN, grep_char=None)


def cps(s):
    return [ord(c) for c in s]


def chunks(s, *, n=3, same=False, cut=False, invalid=False, f=LATIN, mx=None):
    c = cps(s)
    mx = len(c) if mx is None else mx
    return [
        ("".join(chr(x) for x in c[ch.start : ch.end]), ch)
        for ch in split_str(c, n, same, cut, invalid, f, mx)
    ]


def test_split_basic():
    # helper.rs:487-499
    r = chunks("€abc€defg€hijk€lm€opq")
    assert [s for s, _ in r] == ["abc", "defg", "hijk", "opq"]
    assert not r[0][1].s_completes_previous_s


def test_split_left_boundary_completion():
    # helper.rs:501-520
    r = chunks("ab€€defg€hijk€lm€opq", cut=True)
    assert [s for s, _ in r] == ["ab", "defg", "hijk", "opq"]
    s, ch = r[0]
    assert ch.s_completes_previous_s
    assert not ch.s_satisfies_min_char_rule
    assert not ch.s_is_to_be_filtered_again
    s, ch = r[3]
    assert ch.s_is_maybe_cut
    assert ch.s_satisfies_min_char_rule
    assert ch.s_is_to_be_filtered_again


def test_split_right_boundary_short():
    # helper.rs:522-535
    r = chunks("ab€€defg€hijk€lm€op")
    assert [s for s, _ in r] == ["defg", "hijk", "op"]
    s, ch = r[2]
    assert ch.s_is_maybe_cut
    assert not ch.s_satisfies_min_char_rule
    assert ch.s_is_to_be_filtered_again


def test_split_min4():
    # helper.rs:537-550
    r = chunks("€abc€defg€hijk€lm", n=4)
    assert [s for s, _ in r] == ["defg", "hijk", "lm"]
    assert not r[1][1].s_is_maybe_cut
    s, ch = r[2]
    assert ch.s_is_maybe_cut and ch.s_is_to_be_filtered_again


def test_split_end_not_touching():
    # helper.rs:552-564
    r = chunks("€abc€defg€hijk€lmno€", n=4)
    assert [s for s, _ in r] == ["defg", "hijk", "lmno"]
    s, ch = r[2]
    assert not ch.s_is_maybe_cut and not ch.s_is_to_be_filtered_again
    assert ch.s_satisfies_min_char_rule


def test_split_line_wrap():
    # helper.rs:566-593: wrapping at 7 chars; continuations tagged.
    r = chunks("abc€defghiÜjklmnpqrs€", n=4, mx=7)
    assert [s for s, _ in r] == ["defghiÜ", "jklmnpq", "rs"]
    assert not r[0][1].s_completes_previous_s and r[0][1].s_is_maybe_cut
    assert r[1][1].s_completes_previous_s and r[1][1].s_is_maybe_cut
    assert r[2][1].s_completes_previous_s and not r[2][1].s_is_maybe_cut
    assert not r[2][1].s_satisfies_min_char_rule


def test_split_all_ascii():
    # helper.rs:595-615
    r = chunks("abcdefghijklm", n=4)
    assert [s for s, _ in r] == ["abcdefghijklm"]
    assert r[0][1].s_is_maybe_cut  # touches right, more may come
    r = chunks("abcdefghijklm€", n=4)
    assert [s for s, _ in r] == ["abcdefghijklm"]
    assert not r[0][1].s_is_maybe_cut


def test_split_umlauts():
    # helper.rs:617-626
    r = chunks("öö€€ääää€üü€éééé€", n=4, cut=True)
    assert [s for s, _ in r] == ["öö", "ääää", "éééé"]


def test_split_ascii_filter_blocks_multibyte():
    # helper.rs:631-640
    f = Utf8Filter(af=AF_ALL, ubf=UBF_NONE, grep_char=None)
    assert chunks("öö€€ääää€üü€éééé€", n=4, cut=True, f=f) == []


def test_split_same_unicode_block():
    # helper.rs:643-677
    f = Utf8Filter(af=AF_ALL, ubf=UBF_LATIN | UBF_GREEK, grep_char=None)
    r = chunks("0α1βγöäü€α2βγöäüöαβγαg34αäβüäöüαβγöäü", n=3, f=f)
    assert [s for s, _ in r] == ["0α1βγöäü", "α2βγöäüöαβγαg34αäβüäöüαβγöäü"]
    r = chunks("0α1βγöäü€α2βγöäüöαβγαg34αäβüäöü", n=4, same=True, f=f)
    assert [s for s, _ in r] == ["0α1βγ", "α2βγ", "öäüö", "αβγαg34α", "üäöü"]


def test_split_grep_char():
    # helper.rs:679-809
    r = chunks("ac€€xefg€xijk€xm€xp", n=3, cut=True)
    assert [s for s, _ in r] == ["ac", "xefg", "xijk", "xp"]

    f = Utf8Filter(af=AF_ALL, ubf=UBF_LATIN, grep_char=ord("b"))
    r = chunks("ac€€xefg€xijk€xm€xp", n=2, cut=True, f=f, mx=3)
    assert [s for s, _ in r] == ["ac"]
    assert r[0][1].s_completes_previous_s

    f = Utf8Filter(af=AF_ALL, ubf=UBF_LATIN, grep_char=ord("x"))
    r = chunks("ac€€xefg€xijk€xm€xp", n=2, cut=True, f=f, mx=3)
    assert [s for s, _ in r] == ["ac", "xef", "g", "xij", "k", "xm", "xp"]
    assert [c.s_satisfies_grep_char_rule for _, c in r] == [
        False, True, False, True, False, True, True,
    ]
    assert r[6][1].s_is_to_be_filtered_again and r[6][1].s_is_maybe_cut

    f = Utf8Filter(af=AF_ALL, ubf=UBF_LATIN, grep_char=ord("y"))
    r = chunks("öä€€äüöä€äüöö€üö€üü", n=3, f=f)
    assert [s for s, _ in r] == ["üü"]
    assert r[0][1].s_is_to_be_filtered_again and r[0][1].s_is_maybe_cut
