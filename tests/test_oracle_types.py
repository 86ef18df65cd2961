"""Driver-canonicalizer compatibility contract for every oracle.

The grading driver hashes result values through a pandas canonicalizer
(sort columns by name, sort rows, hash cells). Three DuckDB output
types have produced false-red or ERR rows even when values were
correct:

- HUGEINT (``SUM`` over integers widens to int128) — hashes differently
  from Spark's int64,
- LIST/STRUCT/MAP cells — unhashable in pandas (``TypeError:
  unhashable type: 'list'``),
- TIMESTAMP WITH TIME ZONE (``to_timestamp``) — tz-aware dtype vs
  Spark's naive-collected TimestampType.

Every oracle therefore must project only driver-safe types. This runs
DuckDB-side only (cheap) over every registered oracle at sf0.001; the Spark
side is covered by test_oracle_parity, which would surface a Spark/
oracle type mismatch as a value or schema diff.
"""

import pytest

import __spark_entry__ as entry

ORACLES = entry.oracle_sql()

# DuckDB type names the driver's canonicalizer handles losslessly
# against Spark's collected values.
_SAFE = {
    "BOOLEAN",
    "TINYINT",
    "SMALLINT",
    "INTEGER",
    "BIGINT",
    "FLOAT",
    "DOUBLE",
    "VARCHAR",
    "DATE",
    "TIMESTAMP",  # naive; TIMESTAMP WITH TIME ZONE is NOT safe
    "BLOB",
    "JSON",  # materializes as str in pandas; driver-green since round 1
}


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_outputs_only_driver_safe_types(name, ddb):
    # relation API: .types carries real DuckDB type names (HUGEINT,
    # VARCHAR[], TIMESTAMP WITH TIME ZONE...), unlike the DB-API
    # cursor.description's generic NUMBER/STRING codes
    rel = ddb.sql(f"SELECT * FROM ({ORACLES[name]}) LIMIT 0")
    bad = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if str(t) not in _SAFE
    ]
    assert not bad, (
        f"{name}: oracle columns {bad} are outside the driver-safe type "
        "set; CAST sums to BIGINT, serialize arrays, or use naive "
        "timestamps (see module docstring)"
    )
