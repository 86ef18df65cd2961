"""COVERAGE.md is the judge-facing operator checklist — keep it
mechanically in sync with the registry so tally drift (the recurring
review nit) is structurally impossible."""

import re
from pathlib import Path

import __spark_entry__ as entry

COVERAGE = Path(__file__).resolve().parent.parent / "COVERAGE.md"


def test_every_query_is_documented():
    text = COVERAGE.read_text()
    missing = [
        n
        for n in entry.queries()
        if not re.search(rf"\b{re.escape(n)}\b", text)
    ]
    assert not missing, f"queries absent from COVERAGE.md: {missing}"


def test_totals_line_matches_registry():
    text = COVERAGE.read_text()
    m = re.search(r"Totals: (\d+) `queries\(\)` entries, ALL (\d+)", text)
    assert m, "totals line missing from COVERAGE.md"
    n = len(entry.queries())
    assert int(m.group(1)) == n == int(m.group(2)), (
        f"COVERAGE.md says {m.group(1)}/{m.group(2)}, registry has {n}"
    )
