"""Wheel build: compile the PREBUILT generic native emitter.

The runtime builds `libemitter.so` on demand with `-march=native`
(native/__init__.py). A wheel built here additionally ships
`libemitter-generic.so` (portable `-march=x86-64-v3`, plain -O3
fallback), so `pip install` on a toolchain-less host still gets the
native engine instead of silently degrading to the pure-Python path -
the analog of the reference's prebuilt release binaries
(/root/reference/scripts/12-make-targets:22-31).
"""

import subprocess
import sys
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py


class build_py_with_native(build_py):
    def run(self):
        super().run()
        src = Path(__file__).parent / "stringsext_tpu" / "native" / "emitter.cpp"
        out_dir = Path(self.build_lib) / "stringsext_tpu" / "native"
        out_dir.mkdir(parents=True, exist_ok=True)
        out = out_dir / "libemitter-generic.so"
        for flags in (["-O3", "-march=x86-64-v3"], ["-O3"]):
            try:
                subprocess.run(
                    ["g++", *flags, "-shared", "-fPIC", "-std=c++17",
                     "-o", str(out), str(src)],
                    check=True, capture_output=True,
                )
                return
            except (OSError, subprocess.CalledProcessError):
                continue
        sys.stderr.write(
            "stringsext-tpu: WARNING: no g++ at wheel-build time; the "
            "wheel will ship WITHOUT the prebuilt native emitter (hosts "
            "with a toolchain still build it on demand)\n"
        )


setup(cmdclass={"build_py": build_py_with_native})
