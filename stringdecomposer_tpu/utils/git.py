"""Git revision stamping (reference: py/git.py:12-17).

Like the reference since v1.1.1, the driver does NOT call this at startup
(stamping broke runs from outside a repo — reference README.md:119); it is
kept as an opt-in utility for provenance logging.
"""

from __future__ import annotations

import subprocess


def _rev_parse(*args: str) -> str | None:
    try:
        out = subprocess.run(
            ["git", "rev-parse", *args],
            capture_output=True, check=True, timeout=10,
        )
        return out.stdout.decode().strip()
    except Exception:
        return None


def get_git_revision_hash() -> str | None:
    return _rev_parse("HEAD")


def get_git_revision_short_hash() -> str | None:
    return _rev_parse("--short", "HEAD")
