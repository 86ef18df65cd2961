"""Schema-registry semantics without a registry (SURVEY §2.4 C5, §1.2).

The reference validates every produced message against Confluent
Schema Registry with BACKWARD compatibility
(``kafka_publisher.py:101-141``, ``s3-connector-config.json:30``) and
lets the Iceberg sink auto-evolve the table schema
(``connector-config.json:5,23``). Spark has no registry client, so the
engine ships the same *semantics* as a local component:

- ``SchemaRegistry`` — in-memory subject→versions store with
  register-or-reuse and compatibility testing (the
  ``get_schema_id``/``test_compatibility`` flow);
- ``backward_issues`` — BACKWARD rule check between two Spark
  StructTypes (new reader must read old data): fields may be dropped,
  added fields must be nullable, types may only widen.

Plugging a real Confluent registry in is a transport swap; the
decision logic stays here.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

# widenings that are safe for a new reader over old data
_SAFE_WIDENINGS: dict[tuple[str, str], bool] = {
    # keys are DataType.simpleString() names
    ("int", "bigint"): True,
    ("int", "double"): True,
    ("bigint", "double"): True,
    ("float", "double"): True,
    ("date", "timestamp"): True,
    ("tinyint", "int"): True,
    ("smallint", "int"): True,
    ("tinyint", "bigint"): True,
    ("smallint", "bigint"): True,
}


def _simple(t: T.DataType) -> str:
    return t.simpleString()


def backward_issues(old: T.StructType, new: T.StructType) -> list[str]:
    """BACKWARD compatibility: can a reader of ``new`` read data
    written with ``old``? Returns human-readable violations (empty =
    compatible). Nested structs are checked recursively."""
    issues: list[str] = []
    old_fields = {f.name: f for f in old.fields}
    for nf in new.fields:
        of = old_fields.get(nf.name)
        if of is None:
            if not nf.nullable:
                issues.append(
                    f"added field '{nf.name}' must be nullable (no default "
                    "exists in old data)"
                )
            continue
        ot, nt = of.dataType, nf.dataType
        if isinstance(ot, T.StructType) and isinstance(nt, T.StructType):
            issues.extend(
                f"{nf.name}.{i}" if "." not in i else i
                for i in backward_issues(ot, nt)
            )
        elif _simple(ot) != _simple(nt) and not _SAFE_WIDENINGS.get(
            (_simple(ot), _simple(nt)), False
        ):
            issues.append(
                f"field '{nf.name}' narrowed/changed: {_simple(ot)} → {_simple(nt)}"
            )
        if of.nullable and not nf.nullable:
            issues.append(f"field '{nf.name}' became non-nullable")
    return issues


@dataclass
class SchemaRegistry:
    """In-memory registry with the reference's register-or-reuse +
    compatibility-test flow (kafka_publisher.py:110-137)."""

    compatibility: str = "BACKWARD"  # s3-connector-config.json:30
    _subjects: dict[str, list[T.StructType]] = field(default_factory=dict)

    def subjects(self) -> list[str]:
        return sorted(self._subjects)

    def versions(self, subject: str) -> list[int]:
        return list(range(1, len(self._subjects.get(subject, [])) + 1))

    def get(self, subject: str, version: int = -1) -> T.StructType:
        return self._subjects[subject][version if version >= 0 else -1]

    def test_compatibility(self, subject: str, schema: T.StructType) -> list[str]:
        if not self._subjects.get(subject):
            return []
        latest = self._subjects[subject][-1]
        if self.compatibility == "NONE":
            return []
        return backward_issues(latest, schema)

    def register(self, subject: str, schema: T.StructType) -> int:
        """Register-or-reuse: identical schema returns its existing
        version; an incompatible one raises."""
        versions = self._subjects.setdefault(subject, [])
        for i, existing in enumerate(versions):
            if existing.jsonValue() == schema.jsonValue():
                return i + 1
        issues = self.test_compatibility(subject, schema)
        if issues:
            raise ValueError(
                f"schema for {subject!r} fails {self.compatibility} "
                f"compatibility: {issues}"
            )
        versions.append(schema)
        return len(versions)
