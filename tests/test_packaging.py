"""Prebuilt-native wheel story (VERDICT r3 item 8): wheels ship a
portable `libemitter-generic.so` so a toolchain-less `pip install`
still gets the native engine; a g++-less host engages it with a
one-time warning instead of silently degrading to the Python engine.
"""

import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _have_pip():
    try:
        subprocess.run([sys.executable, "-m", "pip", "--version"],
                       capture_output=True, check=True)
        return True
    except Exception:
        return False


@pytest.mark.skipif(not _have_pip(), reason="no pip")
def test_wheel_ships_prebuilt_native_and_runs_without_gxx(tmp_path):
    wheel_dir = tmp_path / "wheels"
    p = subprocess.run(
        [sys.executable, "-m", "pip", "wheel", ".", "--no-deps",
         "--no-build-isolation", "-w", str(wheel_dir)],
        cwd=REPO, capture_output=True, text=True, timeout=300,
    )
    assert p.returncode == 0, p.stderr[-3000:]
    wheels = list(wheel_dir.glob("stringsext_tpu-*.whl"))
    assert len(wheels) == 1, wheels
    with zipfile.ZipFile(wheels[0]) as z:
        names = z.namelist()
    assert "stringsext_tpu/native/libemitter-generic.so" in names, names

    # "install" (extract) the wheel and run a scan from it with g++
    # hidden: the prebuilt engine must load, warn once, and produce
    # byte-correct output.
    target = tmp_path / "site"
    p = subprocess.run(
        [sys.executable, "-m", "pip", "install", "--no-deps", "--target",
         str(target), str(wheels[0])],
        capture_output=True, text=True, timeout=300,
    )
    assert p.returncode == 0, p.stderr[-3000:]

    data = tmp_path / "in.bin"
    data.write_bytes(b"\x00\x01hello prebuilt world\x02\xff" * 10)
    prog = (
        "import sys, io\n"
        "from stringsext_tpu import native\n"
        "assert native.get_lib() is not None, 'prebuilt lib did not load'\n"
        "from stringsext_tpu.cli import parse_args\n"
        "from stringsext_tpu.run import run\n"
        f"args = parse_args(['-t','x','-e','ascii', {str(str(data))!r}])\n"
        "buf = io.BytesIO()\n"
        "assert run(args, out=buf, engine='auto') == 0\n"
        "assert b'hello prebuilt world' in buf.getvalue()\n"
        "print('PREBUILT-OK')\n"
    )
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH",)}
    env["PATH"] = str(tmp_path / "emptybin")  # no g++ anywhere
    os.makedirs(env["PATH"], exist_ok=True)
    env["PYTHONPATH"] = str(target)
    p = subprocess.run(
        [sys.executable, "-c", prog], capture_output=True, text=True,
        timeout=120, env=env, cwd=str(tmp_path),
    )
    assert p.returncode == 0, (p.stdout[-2000:], p.stderr[-3000:])
    assert "PREBUILT-OK" in p.stdout
    assert "prebuilt generic" in p.stderr, p.stderr[-2000:]


def test_no_toolchain_no_prebuilt_warns_loudly(tmp_path, monkeypatch):
    """Neither g++ nor the prebuilt library: the degradation to the
    pure-Python engine must be loud (round-1 'no silent caps' rule)."""
    import importlib

    from stringsext_tpu import native as nat

    src = tmp_path / "native"
    shutil.copytree(os.path.join(REPO, "stringsext_tpu", "native"), src)
    for so in src.glob("*.so"):
        so.unlink()
    monkeypatch.setattr(nat, "_DIR", str(src))
    monkeypatch.setattr(nat, "_SRC", str(src / "emitter.cpp"))
    monkeypatch.setattr(nat, "_LIB", str(src / "libemitter.so"))
    monkeypatch.setattr(nat, "_LIB_GENERIC",
                        str(src / "libemitter-generic.so"))
    monkeypatch.setattr(nat, "_lib", None)
    monkeypatch.setattr(nat, "_lib_tried", False)
    monkeypatch.setenv("PATH", str(tmp_path / "emptybin"))
    os.makedirs(tmp_path / "emptybin", exist_ok=True)
    import io
    from contextlib import redirect_stderr

    err = io.StringIO()
    with redirect_stderr(err):
        lib = nat.get_lib()
    assert lib is None
    assert "pure-Python engine" in err.getvalue()
    # restore the module state for later tests
    monkeypatch.undo()
    nat._lib = None
    nat._lib_tried = False
    importlib.reload(nat)

@pytest.mark.skipif(shutil.which("dpkg-deb") is None, reason="no dpkg-deb")
@pytest.mark.skipif(not _have_pip(), reason="no pip")
def test_build_packages_deb(tmp_path):
    """scripts/build_packages.py produces an installable-shaped .deb
    (the analog of the reference's scripts/15-build-packages): wheel
    contents under dist-packages, a /usr/bin/stringsext launcher, the
    gzipped man page, and sane control metadata."""
    p = subprocess.run(
        [sys.executable, "scripts/build_packages.py", str(tmp_path)],
        cwd=REPO, capture_output=True, text=True, timeout=360,
    )
    assert p.returncode == 0, p.stderr[-3000:]
    debs = list(tmp_path.glob("stringsext-tpu_*_amd64.deb"))
    assert len(debs) == 1, list(tmp_path.iterdir())
    toc = subprocess.run(["dpkg-deb", "-c", str(debs[0])],
                         capture_output=True, text=True, check=True).stdout
    for want in (
        "./usr/bin/stringsext",
        "dist-packages/stringsext_tpu/cli.py",
        "dist-packages/stringsext_tpu/native/libemitter-generic.so",
        "./usr/share/man/man1/stringsext.1.gz",
    ):
        assert want in toc, f"{want} missing from deb"
    info = subprocess.run(["dpkg-deb", "-I", str(debs[0])],
                          capture_output=True, text=True, check=True).stdout
    assert "Package: stringsext-tpu" in info
    assert "Architecture: amd64" in info
