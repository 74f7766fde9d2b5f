"""Shared corpus + config definitions for the extended golden cases
(tests/test_golden_extra.py pins today's verified behavior as frozen
expected-output files; scripts/regen_golden_extra.py regenerates them).

Corpora are generated deterministically here rather than checked in;
only the expected OUTPUT bytes live in git (tests/golden_extra/)."""

import numpy as np


def corpus_main() -> bytes:
    rng = np.random.default_rng(20260819)
    data = bytearray(rng.integers(0, 256, 65536, np.uint8).tobytes())
    data[9000:13000] = b"\x00" * 4000
    plants = [
        (2000, b"plain ascii string with spaces / and ? marks"),
        (5001, "déjà vu €uro über naïve".encode()),
        (9500, "Русский текст в дампе".encode("utf-16-le")),
        (14000, "Ελληνικά γράμματα".encode("utf-16-be")),
        (20000, "日本語テキスト".encode("cp932")),
        (26001, "한국어 문자열".encode("cp949")),
        (32000, "中文测试文本".encode("gb18030")),
        (38000, "астральные \U0001F600\U0001D11E пары?".encode("utf-16-le")),
        (44000, "КОИ8 текст".encode("koi8_r")),
        (50000, "ISO-2022 日本語 section".encode("iso2022_jp")),
        (56000, "mixed Кириллица и latin words".encode()),
        (60001, b"?grep?target?line?with?many?marks?"),
    ]
    for off, b in plants:
        data[off : off + len(b)] = b
    return bytes(data)


def corpus_files():
    """Three files with odd/even lengths (concatenation + file ids)."""
    blob = corpus_main()
    return [blob[:20001], blob[20001:45000], blob[45000:]]


# (name, argv-without-inputs, multi_file)
CASES = [
    ("multi_file_octal_grep",
     ["-t", "o", "-g", "63", "-e", "UTF-8", "-e", "utf-16le"], True),
    ("same_block_cyrillic",
     ["-t", "x", "-r", "-u", "Cyrillic", "-e", "UTF-8", "-e", "utf-16le"],
     False),
    ("per_encoding_dsl",
     ["-t", "d", "-e", "UTF-8,8,All-Ctrl,Cyrillic,63", "-e", "euc-kr,3"],
     False),
    ("no_metadata_min2", ["-c", "-n", "2", "-e", "windows-1252"], False),
    ("cjk_asian_mix",
     ["-t", "x", "-u", "Asian", "-e", "iso-2022-jp", "-e", "shift_jis",
      "-e", "gb18030", "-e", "big5"], False),
    ("ascii_emulation_koi8",
     ["-t", "d", "-a", "All", "-e", "ascii", "-e", "KOI8-R"], False),
    ("counter_offset", ["-t", "d", "-s", "123456", "-e", "UTF-8"], False),
    ("astral_grep_wrap",
     ["-t", "x", "-q", "8", "-g", "63", "-e", "utf-16le", "-e", "utf-16be"],
     False),
    # minimum legal line length (options.rs:33): heavy wrapping + `+`
    ("wrap_min_q6", ["-t", "x", "-q", "6", "-e", "UTF-8", "-e", "utf-16be"],
     False),
    # odd --counter-offset with UTF-16 (offsets shift, unit phase is
    # buffer-relative and must NOT shift)
    ("odd_counter_offset_utf16",
     ["-t", "d", "-s", "7", "-e", "utf-16le", "-e", "utf-16be"], False),
    # control+whitespace AF + grep '/' (path-search pattern)
    ("ctrlwsp_af_grep_slash",
     ["-t", "x", "-a", "All-Ctrl+Wsp", "-g", "47", "-e", "UTF-8"], False),
    # three single-byte encodings scanning the same bytes
    ("singlebyte_trio",
     ["-c", "-n", "3", "-e", "ibm866", "-e", "iso-8859-5",
      "-e", "windows-874"], False),
    # file letters + radix with 3 missions (A/B/C columns + tie-breaks)
    ("multifile_letters_3enc",
     ["-t", "x", "-e", "UTF-8", "-e", "utf-16le", "-e", "utf-16be"], True),
    # Uncommon = private-use + astral planes only (4-byte UTF-8 /
    # surrogate pairs pass, BMP text is filtered out)
    ("uncommon_astral_only",
     ["-t", "x", "-u", "Uncommon", "-n", "2", "-e", "UTF-8",
      "-e", "utf-16le"], False),
    # custom hexadecimal UBF (Greek|Hebrew leads) on 8859 variants
    ("hex_ubf_8859",
     ["-t", "d", "-u", "0xc0c000", "-e", "iso-8859-7", "-e", "iso-8859-8"],
     False),
]
