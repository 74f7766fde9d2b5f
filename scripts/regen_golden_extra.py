"""Regenerate tests/golden_extra/*.bin expected outputs from the
pure-Python oracle. Run only when intentionally changing observable
behavior; the diff IS the behavior change."""

import io
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tests")
)

from golden_extra import CASES, corpus_files, corpus_main  # noqa: E402

from stringsext_tpu.cli import parse_args  # noqa: E402
from stringsext_tpu.run import run  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden_extra")


def main():
    os.makedirs(OUT, exist_ok=True)
    blobs_multi = corpus_files()
    blob = corpus_main()
    with tempfile.TemporaryDirectory() as d:
        single = os.path.join(d, "main.bin")
        with open(single, "wb") as f:
            f.write(blob)
        multi = []
        for i, b in enumerate(blobs_multi):
            p = os.path.join(d, f"f{i}.bin")
            with open(p, "wb") as f:
                f.write(b)
            multi.append(p)
        for name, argv, is_multi in CASES:
            inputs = multi if is_multi else [single]
            buf = io.BytesIO()
            rc = run(parse_args(argv + inputs), out=buf, engine="python")
            assert rc == 0
            path = os.path.join(OUT, f"{name}.bin")
            with open(path, "wb") as f:
                f.write(buf.getvalue())
            print(f"{name}: {buf.tell()} bytes")


if __name__ == "__main__":
    main()
