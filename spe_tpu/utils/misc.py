"""Small runtime utilities (reference util/misc.py odds and ends).

get_sha: git SHA/diff/branch stamp printed at driver start (reference
util/misc.py:256-273, printed at main.py:152).

setup_for_distributed: suppress stdout on non-zero processes by replacing
builtins.print with a gated version that honors force=True (reference
util/misc.py:370-382 `setup_for_distributed`).
"""

from __future__ import annotations

import builtins
import os
import subprocess


def get_sha(cwd: str | None = None) -> str:
    """'<sha>, diff: <clean|has uncommitted changes>, branch: <name>'."""
    cwd = cwd or os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    def _run(cmd):
        return subprocess.check_output(
            cmd, cwd=cwd, stderr=subprocess.DEVNULL).decode("ascii").strip()

    sha, diff, branch = "N/A", "clean", "N/A"
    try:
        sha = _run(["git", "rev-parse", "HEAD"])
        subprocess.check_output(["git", "diff"], cwd=cwd, stderr=subprocess.DEVNULL)
        diff = _run(["git", "diff-index", "HEAD"])
        diff = "has uncommitted changes" if diff else "clean"
        branch = _run(["git", "rev-parse", "--abbrev-ref", "HEAD"])
    except Exception:
        pass
    return f"sha: {sha}, status: {diff}, branch: {branch}"


_builtin_print = builtins.print


def setup_for_distributed(is_master: bool) -> None:
    """On non-master processes, print() becomes a no-op unless force=True."""

    def print_gated(*args, force: bool = False, **kwargs):
        if is_master or force:
            _builtin_print(*args, **kwargs)

    builtins.print = print_gated


def restore_print() -> None:
    builtins.print = _builtin_print
