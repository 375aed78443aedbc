"""Build the native components with the system toolchain.

Usage: python -m spe_tpu.native.build
"""

from __future__ import annotations

import pathlib
import subprocess
import sys

HERE = pathlib.Path(__file__).resolve().parent

TARGETS = [
    # (source, output, extra flags)
    ("lapjv.cc", "liblapjv.so", []),
    ("dataio.cc", "libdataio.so", ["-pthread", "-ljpeg"]),
]


def build(verbose: bool = True) -> bool:
    ok = True
    for src, out, flags in TARGETS:
        src_p = HERE / src
        out_p = HERE / out
        if not src_p.exists():
            continue
        if out_p.exists() and out_p.stat().st_mtime >= src_p.stat().st_mtime:
            continue
        cmd = ["g++", "-O3", "-march=native", "-funroll-loops", "-shared", "-fPIC", "-std=c++17",
               "-o", str(out_p), str(src_p)] + flags
        if verbose:
            print("+", " ".join(cmd))
        try:
            subprocess.run(cmd, check=True, capture_output=not verbose)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            print(f"native build failed for {src}: {e}", file=sys.stderr)
            ok = False
    return ok


if __name__ == "__main__":
    sys.exit(0 if build() else 1)
