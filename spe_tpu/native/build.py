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

# Portable ISA baseline: -march=native would tie the .so to the build host
# (SIGILL when the repo or a shared FS moves to a CPU without e.g. AVX-512).
# x86-64-v2 (SSE4.2/POPCNT) is ~universal on anything that runs a TPU host.
BASE_FLAGS = ["-O3", "-march=x86-64-v2", "-funroll-loops", "-shared",
              "-fPIC", "-std=c++17"]


def _cmd(src_p: pathlib.Path, out_p: pathlib.Path, flags) -> list:
    return ["g++", *BASE_FLAGS, "-o", str(out_p), str(src_p)] + flags


def build(verbose: bool = True) -> bool:
    ok = True
    for src, out, flags in TARGETS:
        src_p = HERE / src
        out_p = HERE / out
        stamp_p = HERE / (out + ".buildinfo")
        if not src_p.exists():
            continue
        cmd = _cmd(src_p, out_p, flags)
        stamp = " ".join(cmd)
        # rebuild when the source is newer OR the flags changed (the stamp
        # records the exact command; a flag change like the -march baseline
        # must invalidate a cached .so built with old flags)
        if (out_p.exists() and out_p.stat().st_mtime >= src_p.stat().st_mtime
                and stamp_p.exists() and stamp_p.read_text() == stamp):
            continue
        if verbose:
            print("+", stamp)
        try:
            subprocess.run(cmd, check=True, capture_output=not verbose)
            stamp_p.write_text(stamp)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            print(f"native build failed for {src}: {e}", file=sys.stderr)
            ok = False
    return ok


if __name__ == "__main__":
    sys.exit(0 if build() else 1)
