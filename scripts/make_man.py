"""Generate docs/stringsext-tpu.1 (troff man page) from docs/MANUAL.md.

The reference builds its man page with pandoc (doc/make--all); this
environment has no pandoc, so a small deterministic subset-of-markdown
converter covers MANUAL.md's structure: #/## headings, paragraphs,
bullet lists, fenced code blocks, and tables (rendered as plain rows).
Inline `code`, **bold** and *italic* map to troff fonts.

Usage: python scripts/make_man.py  (writes docs/stringsext-tpu.1)
"""

import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "docs", "MANUAL.md")
DST = os.path.join(ROOT, "docs", "stringsext-tpu.1")


def esc(s: str) -> str:
    s = s.replace("\\", "\\e")
    if s.startswith(".") or s.startswith("'"):
        s = "\\&" + s
    return s


def inline(s: str) -> str:
    s = esc(s)
    s = re.sub(r"\*\*([^*]+)\*\*", r"\\fB\1\\fR", s)
    s = re.sub(r"`([^`]+)`", r"\\fC\1\\fR", s)
    s = re.sub(r"(?<![\w\\])\*([^*]+)\*", r"\\fI\1\\fR", s)
    return s


def convert(md: str) -> str:
    out = [
        '.TH "STRINGSEXT-TPU" "1" "2026" "stringsext-tpu" "User Commands"',
        ".SH NAME",
        "stringsext-tpu \\- find multi-byte encoded strings in binary data",
    ]
    lines = md.splitlines()
    i = 0
    in_code = False
    para: list[str] = []

    def flush():
        if para:
            out.append(".PP")
            out.append(inline(" ".join(para)))
            para.clear()

    while i < len(lines):
        ln = lines[i]
        if ln.startswith("```"):
            flush()
            if not in_code:
                out.append(".PP")
                out.append(".nf")
                out.append("\\fC")
            else:
                out.append("\\fR")
                out.append(".fi")
            in_code = not in_code
            i += 1
            continue
        if in_code:
            out.append(esc(ln))
            i += 1
            continue
        if ln.startswith("# "):
            flush()
            # The markdown H1 is the page title - already emitted.
            i += 1
            continue
        if ln.startswith("## "):
            flush()
            out.append(f'.SH "{esc(ln[3:].strip().upper())}"')
            i += 1
            continue
        if ln.startswith("- "):
            flush()
            # gather the full (possibly wrapped) bullet
            item = [ln[2:].strip()]
            i += 1
            while i < len(lines) and lines[i].startswith("  ") and lines[i].strip():
                item.append(lines[i].strip())
                i += 1
            out.append(".TP")
            text = " ".join(item)
            # split "FLAGS - description" into a tagged paragraph
            m = re.match(r"(`[^`]+`(?:,? ?`[^`]+`)*) - (.*)", text)
            if m:
                out.append(inline(m.group(1)))
                out.append(inline(m.group(2)))
            else:
                out.append("\\(bu")
                out.append(inline(text))
            continue
        if ln.startswith("|"):
            flush()
            # table: render rows as aligned plain text in no-fill mode
            rows = []
            while i < len(lines) and lines[i].startswith("|"):
                cells = [c.strip() for c in lines[i].strip("|").split("|")]
                if not all(re.fullmatch(r":?-+:?", c) for c in cells):
                    rows.append(cells)
                i += 1
            if not rows:  # separator-only block: nothing to render
                continue
            widths = [
                max(len(re.sub(r"[`*]", "", r[c])) if c < len(r) else 0
                    for r in rows)
                for c in range(max(len(r) for r in rows))
            ]
            out.append(".PP")
            out.append(".nf")
            for r in rows:
                padded = [
                    re.sub(r"[`*]", "", r[c] if c < len(r) else "").ljust(widths[c])
                    for c in range(len(widths))
                ]
                out.append(esc("  ".join(padded).rstrip()))
            out.append(".fi")
            continue
        if not ln.strip():
            flush()
            i += 1
            continue
        para.append(ln.strip())
        i += 1
    flush()
    if in_code:  # unclosed fence at EOF: close it to keep troff valid
        out.append("\\fR")
        out.append(".fi")
    out.append(".SH SEE ALSO")
    out.append("strings(1), stringsext(1)")
    return "\n".join(out) + "\n"


def main():
    with open(SRC, encoding="utf-8") as f:
        md = f.read()
    page = convert(md)
    with open(DST, "w", encoding="utf-8") as f:
        f.write(page)
    print(f"wrote {DST} ({len(page)} bytes)")


if __name__ == "__main__":
    main()
