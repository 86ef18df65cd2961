"""Regenerate __spark_entry__._PRIORITY for the next driver round.

Standing rotation (r11 rule, kept by every round since): the window
the driver checks is the FIRST 50 entries, so the list is ordered
  1. DIRTY — operators whose executed plan / code path / registration
     changed this round (edit the DIRTY list below each round);
  2. everything else by ASCENDING last-driver-checked round (computed
     from the union of CORRECTNESS_r*.json), ties broken by the
     previous _PRIORITY order (which already encodes prior staleness).

Run from the repo root:  python tools/rotate_priority.py
Rewrites the _PRIORITY block in place; run the docs-consistency tests
afterwards (they pin uniqueness and registry coverage).

MUST run BEFORE this round's CORRECTNESS_rN.json exists (i.e. before
the driver writes it): re-running after it lands would reshuffle the
tail relative to the committed list.
"""

from __future__ import annotations

import glob
import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

# EDIT EACH ROUND: the round being prepared (enforces the
# run-at-round-start invariant: this round's CORRECTNESS file must
# not exist yet, or the staleness ordering would double-credit it).
ROUND = 17

# EDIT EACH ROUND: this round's dirty set, most-critical first.
DIRTY = [
    # r17: no operator's EXECUTED plan changed (the round's code
    # changes are bench.py summary-line probe semantics, bench_diff
    # verdict tokens/annotations, and test tripwire AST work) — the
    # whole window goes to the staleness drain, finishing the last
    # 11 pre-r8 rows per the r16 verdict's task 1.
]


def main() -> None:
    entry_path = ROOT / "__spark_entry__.py"
    src = entry_path.read_text()
    head, rest = src.split("_PRIORITY = [", 1)
    listpart, tail = rest.split("]", 1)
    prev = re.findall(r'"([^"]+)"', listpart)

    # sort NUMERICALLY by round (lexicographic sort mis-orders r100+
    # against two-digit names)
    last: dict[str, int] = {}
    files = sorted(
        glob.glob(str(ROOT / "CORRECTNESS_r*.json")),
        key=lambda f: int(re.search(r"_r(\d+)\.json$", f).group(1)),
    )
    for f in files:
        rnd = int(re.search(r"_r(\d+)\.json$", f).group(1))
        # explicit raise, not assert: python -O strips asserts and the
        # invariant would silently stop being enforced
        if rnd >= ROUND:
            raise SystemExit(
                f"CORRECTNESS_r{rnd:02d}.json already exists but "
                f"ROUND={ROUND}: this tool must run at round start "
                "(before the driver writes the round's file) — bump "
                "ROUND if preparing the next round"
            )
        for k in json.load(open(f)):
            last[k] = rnd

    import __spark_entry__ as entry

    registry = list(entry.queries())
    missing_dirty = [d for d in DIRTY if d not in registry]
    if missing_dirty:
        raise SystemExit(f"DIRTY not in registry: {missing_dirty}")

    prev_pos = {n: i for i, n in enumerate(prev)}
    rest_names = [n for n in registry if n not in DIRTY]
    rest_sorted = sorted(
        rest_names,
        key=lambda n: (last.get(n, 0), prev_pos.get(n, len(prev))),
    )
    out = DIRTY + rest_sorted
    if not (len(out) == len(set(out)) == len(registry)):
        raise SystemExit(
            f"rotation invariant broken: {len(out)} rotated / "
            f"{len(set(out))} unique / {len(registry)} registry — "
            "check DIRTY for duplicates"
        )

    lines = []
    for i in range(0, len(out), 3):
        lines.append(
            "    " + ", ".join(f'"{n}"' for n in out[i : i + 3]) + ","
        )
    entry_path.write_text(
        head + "_PRIORITY = [\n" + "\n".join(lines) + "\n]" + tail
    )
    window = out[:50]
    stale_after = sorted(
        {last.get(n, 0) for n in out[50:] if n not in DIRTY}
    )
    print(f"window-50 head: {window[:8]} ...")
    print(f"rounds represented in post-window tail: {stale_after}")
    n_old = sum(1 for n in out[50:] if last.get(n, 0) < 8)
    print(f"tail rows still pre-r8 after this window drains: {n_old}")


if __name__ == "__main__":
    main()
