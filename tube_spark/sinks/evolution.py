"""Schema-evolution gating for versioned publishes.

A versioned corpus/index (``sinks/writer.py``) changes shape over
time: curation adds a feature column, a type gets widened, a field is
retired.  Readers pin to the ALIAS, so an incompatible publish breaks
them silently at read time — the gate belongs at publish time, next to
the freshness, quality, and delta gates.

``diff_schemas`` classifies field-level changes between the current
published version and the candidate:

* ``added``     — new column (always backward-compatible: old readers
                  project it away, new readers coalesce on old data);
* ``dropped``   — column removed (breaks readers that select it);
* ``retyped``   — same name, different type.  Numeric WIDENINGS
                  (int→long, float→double, int→double …) are flagged
                  compatible — parquet/Spark read the old narrow values
                  through the wide schema — everything else is not;
* ``nullability`` relaxations (required→nullable) are compatible;
  tightenings are reported but compatible for readers (data already
  satisfies the stricter contract only if the writer checked — that is
  ``quality_checks.completeness``'s job, not the schema gate's).

``check_evolution`` raises unless every change is compatible or
``allow_breaking=True`` — the same refuse-by-default posture as the
delta gate.  Nested structs/arrays are compared recursively through
their ``simpleString`` types.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import types as T

_WIDENINGS = {
    ("byte", "short"), ("byte", "int"), ("byte", "bigint"),
    ("short", "int"), ("short", "bigint"),
    ("int", "bigint"),
    ("byte", "double"), ("short", "double"), ("int", "double"),
    ("bigint", "double"), ("float", "double"),
    ("byte", "float"), ("short", "float"), ("int", "float"),
}


@dataclass(frozen=True)
class SchemaChange:
    kind: str  # added | dropped | retyped | nullability
    field: str
    old: str | None
    new: str | None
    compatible: bool


def diff_schemas(old: T.StructType, new: T.StructType) -> list[SchemaChange]:
    changes: list[SchemaChange] = []
    old_f = {f.name: f for f in old.fields}
    new_f = {f.name: f for f in new.fields}
    for name, f in new_f.items():
        if name not in old_f:
            changes.append(
                SchemaChange("added", name, None, f.dataType.simpleString(), True)
            )
    for name, f in old_f.items():
        if name not in new_f:
            changes.append(
                SchemaChange("dropped", name, f.dataType.simpleString(), None, False)
            )
            continue
        nf = new_f[name]
        ot, nt = f.dataType.simpleString(), nf.dataType.simpleString()
        if ot != nt:
            changes.append(
                SchemaChange("retyped", name, ot, nt, (ot, nt) in _WIDENINGS)
            )
        elif f.nullable != nf.nullable:
            changes.append(
                SchemaChange(
                    "nullability",
                    name,
                    "nullable" if f.nullable else "required",
                    "nullable" if nf.nullable else "required",
                    True,
                )
            )
    return changes


def check_evolution(
    old: T.StructType, new: T.StructType, allow_breaking: bool = False
) -> list[SchemaChange]:
    """Returns the change list; raises on incompatible changes unless
    ``allow_breaking``."""
    changes = diff_schemas(old, new)
    breaking = [c for c in changes if not c.compatible]
    if breaking and not allow_breaking:
        detail = "; ".join(
            f"{c.kind} {c.field} ({c.old} -> {c.new})" for c in breaking
        )
        raise ValueError(
            f"schema evolution gate: breaking change(s): {detail} — "
            "pass allow_breaking=True to publish anyway"
        )
    return changes
