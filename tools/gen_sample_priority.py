#!/usr/bin/env python3
"""Regenerate the `_SAMPLE_PRIORITY` body in registry.py (stalest-first
gate rotation — VERDICT r6 #4 / r9 #1 / r10 #2 policy).

The driver's correctness gate samples the FIRST ~50 keys of
`queries()`, and registration order is `_SAMPLE_PRIORITY`, so this list
is the sampling schedule. Policy once every key has at least one driver
witness (true since r10): sort ALL registry keys by

    (latest driver-witness round ASC, rows-only after oracle, name)

so the stalest witnesses head the sample and every key's witness stays
at most ~5 rounds old. Keys with NO witness (new this round) sort to
round 0 — the very head.

Usage:  python3 tools/gen_sample_priority.py          # print the body
        python3 tools/gen_sample_priority.py --write  # splice into registry.py

Run it at the END of a round (after new keys are registered) so the
next round's gate samples the new keys plus the stalest block.
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REG = os.path.join(REPO, "blockchain2graphdb_spark", "registry.py")


def latest_witness() -> dict[str, int]:
    latest: dict[str, int] = {}
    for p in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        r = int(os.path.basename(p).split("_r")[1].split(".")[0])
        for k in json.load(open(p)):
            latest[k] = r
    return latest


# Keys whose SEMANTICS changed this round (re-registrations): treated
# as never-witnessed so the next driver gate re-witnesses them first.
# Clear this set when regenerating for a round with no re-registrations.
PINNED_FRESH = {"label_noise_knn"}  # r16: LSH-bucketed re-registration


def main() -> None:
    sys.path.insert(0, REPO)
    from blockchain2graphdb_spark import registry

    specs = registry.load_all()
    latest = latest_witness()
    keys = sorted(
        specs,
        key=lambda k: (
            0 if k in PINNED_FRESH else latest.get(k, 0),
            specs[k].oracle is None,
            k,
        ),
    )
    lines = [
        f'    "{k}",  # r{latest.get(k, 0)} '
        + ("oracle" if specs[k].oracle else "rows-only")
        for k in keys
    ]
    body = "\n".join(lines)
    if "--write" in sys.argv:
        src = open(REG).read()
        start = src.index("_SAMPLE_PRIORITY = (")
        # replace the head-marker comment line too, stamping the round
        # from the newest CORRECTNESS file + 1 (so the comment can't go
        # stale when the list is regenerated mid-round)
        marker = "# --- new round-"
        nxt = max(latest.values(), default=0) + 1
        head = (
            f"    # --- new round-{nxt} head: never-driver-witnessed"
            " first, then stalest ---\n"
        )
        mstart = src.index(marker, start)
        mend = src.index("\n", mstart) + 1
        close = src.index("\n)\n", mend)
        src = src[: src.rindex("\n", 0, mstart) + 1] + head + body + src[close:]
        open(REG, "w").write(src)
        print(f"wrote {len(keys)} keys into registry.py (round-{nxt} head)")
    else:
        print(body)


if __name__ == "__main__":
    main()
