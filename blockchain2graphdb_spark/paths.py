"""Repo-relative paths shared by operators, streaming replays and tests.

Everything scratch-like (blockfile fixtures, snapshot stores, streaming
replay dirs) lives under `<repo>/.tmp` (gitignored, safe to delete).
Deriving the root from this file's location — overridable via
$SPARK_GRAFT_TMP_ROOT — keeps the repo relocatable (ADVICE r5).
"""

from __future__ import annotations

import os

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def tmp_root() -> str:
    root = os.environ.get("SPARK_GRAFT_TMP_ROOT") or os.path.join(
        REPO_ROOT, ".tmp"
    )
    os.makedirs(root, exist_ok=True)
    return root
