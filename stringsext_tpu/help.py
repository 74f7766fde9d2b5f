"""Help, version, option debugging, and encoding listing.

Parity reference: /root/reference/src/help.rs:16-145.
"""

from __future__ import annotations

from . import version_line
from .mission import ASCII_FILTER_ALIASSE, Missions, UNICODE_BLOCK_FILTER_ALIASSE
from .encodings import ALL_ENCODING_NAMES
from .options import ASCII_ENC_LABEL, Args


def help_and_maybe_exit(args: Args) -> bool:
    """Handles -V / -d / -l; returns True if the program should exit
    (help.rs:16-145)."""
    if args.version:
        print(version_line())
        return True

    if args.debug_option:
        print("GIVEN COMMANDLINE-ARGUMENTS\n")
        print("Input files\n-----------")
        for n, name in enumerate(args.inputs):
            print(f'{chr(n + 65)} = "{name}"')
        print("\nEncoding and filter definitions\n-------------------------------")
        for n, name in enumerate(args.encoding):
            print(f"{chr(n + 97)} = {name}")
        print("\n\nPARSED COMMANDLINE-ARGUMENTS\n")
        missions = Missions.from_args(args)
        for i, m in enumerate(missions):
            print(f"Scanner ({chr(i + 97)})\n-----------")
            print(f"Mission {{")
            print(f"    mission_id: {m.mission_id},")
            print(f"    counter_offset: {m.counter_offset},")
            print(f"    encoding: {m.encoding_name},")
            print(f"    chars_min_nb: {m.chars_min_nb},")
            print(f"    require_same_unicode_block: {m.require_same_unicode_block},")
            g = ("None" if m.filter.grep_char is None
                 else f"Some({m.filter.grep_char})")  # Rust Option Debug
            print(
                f"    filter: af: 0x{m.filter.af:x}, ubf: 0x{m.filter.ubf:x}, "
                f"grep_char: {g},"
            )
            print(f"    output_line_char_nb_max: {m.output_line_char_nb_max},")
            print(f"    print_encoding_as_ascii: {m.print_encoding_as_ascii},")
            print(f"}}\n")
        return True

    if args.list_encodings:
        print("LIST OF AVAILABLE ENCODINGS AND PREDEFINED FILTERS\n")
        print("Format: --encoding=[ENC_NAME],[MIN],[AF,UBF],[GREP]\n\n")
        print("ENC_NAME (Encoding)=")
        listed = [ASCII_ENC_LABEL] + [n for n in ALL_ENCODING_NAMES]
        for e in listed:
            print(f"\t{e}")
        print("\tWarning: this list may be outdated.")
        print(
            "\tPlease consult the library `encoding_rs` documentation "
            "for more available encodings.\n\n"
        )
        print("MIN = <number>")
        print("\tOnly strings with at least <number> characters are printed.\n\n")
        print("AF (ASCII-Filter) = <filter name> or <hexadecimal number>")
        for name, value, desc in ASCII_FILTER_ALIASSE:
            print(f"\t{name} = {('%#x' % value):>35} ({desc.strip()})")
        print("\tUse predefined filter names above or your own filter starting with `0x...`.\n\n")
        print("UBF (Unicode-Block-Filter) = <filter name> or <hexadecimal number>")
        for name, value, desc in UNICODE_BLOCK_FILTER_ALIASSE:
            print(f"\t{name} = {('%#x' % value):>18} ({desc.strip()})")
        print("\tUse predefined filter names above or your own filter starting with `0x...`.\n\n")
        print("GREP = <ASCII code>")
        print("\tPrint only lines having at least one character with <ASCII-code>.")
        print("\tUseful values are `47` (/) or `92` (\\) for path search.")
        print("\t<ASCII code> can be decimal or hexadecimal and must be < 128.")
        return True

    return False
