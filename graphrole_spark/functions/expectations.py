"""Declarative data-quality expectations over any DataFrame — the
"validate before training" gate a 100 TB pipeline runs between
ingestion and every downstream consumer (the Great-Expectations /
dbt-test pattern, engine-native).

The reference (GraphRole) has no counterpart — its inputs are trusted
in-memory graphs; at pipeline scale, schema drift, NULL floods,
key collisions and broken foreign keys are the routine failure modes
that silently corrupt features long before a model sees them.

Design (100 TB lens): every row-level check (not_null / in_set /
in_range / matches / unique) compiles into ONE conditional aggregate
over a single table scan — adding checks adds codegen expressions,
never passes. `unique` rides the same aggregate via count_distinct
(exact; the expand it induces is documented — swap for a dedicated
groupBy if a table has many uniqueness keys). Referential checks
(`fk`) are one left-anti-count each against their (usually
dimension-sized, broadcastable) reference. The result is a tiny
per-check frame: unions of scalars, no shuffle of the audited table
beyond the aggregate's map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ROW_CHECKS = ("not_null", "in_set", "in_range", "matches", "finite")
_ALL_CHECKS = _ROW_CHECKS + ("unique", "row_count", "fk")


def _violation_expr(spec: dict):
    """Row-level predicate that is 1 when the row VIOLATES the check."""
    kind = spec["check"]
    c = F.col(spec["column"])
    if kind == "not_null":
        return c.isNull()
    if kind == "in_set":
        vals = list(spec["values"])
        if not vals:
            raise ValueError("in_set needs a non-empty values list")
        # NULL is not a set violation — not_null is its own check
        return c.isNotNull() & ~c.isin(vals)
    if kind == "in_range":
        lo, hi = spec.get("min"), spec.get("max")
        if lo is None and hi is None:
            raise ValueError("in_range needs min and/or max")
        cond = F.lit(False)
        if lo is not None:
            cond = cond | (c < F.lit(lo))
        if hi is not None:
            cond = cond | (c > F.lit(hi))
        return c.isNotNull() & cond
    if kind == "matches":
        return c.isNotNull() & ~c.rlike(spec["pattern"])
    if kind == "finite":
        # NaN/±Inf slip through in_range (NaN compares false, Inf is
        # in-range of a one-sided bound) and silently poison feature
        # matrices — audit them explicitly
        d = c.cast("double")
        return d.isNotNull() & (F.isnan(d) | (F.abs(d) == float("inf")))
    raise ValueError(f"unknown row check {kind!r}")


def _target(spec: dict) -> str:
    kind = spec["check"]
    if kind == "unique":
        return ",".join(spec["columns"])
    if kind == "row_count":
        return "*"
    if kind == "fk":
        return f"{spec['column']}->{spec.get('ref_column', spec['column'])}"
    return spec["column"]


def expect(table: DataFrame, checks: list[dict]) -> DataFrame:
    """Run declarative expectations; return one row per check.

    ``checks`` is a list of dicts, each with a ``check`` key:

    * ``{"check": "not_null", "column": c}`` — NULLs are violations.
    * ``{"check": "in_set", "column": c, "values": [...]}`` — non-NULL
      values outside the set.
    * ``{"check": "in_range", "column": c, "min": lo, "max": hi}`` —
      either bound optional; non-NULL values outside ``[lo, hi]``.
    * ``{"check": "matches", "column": c, "pattern": regex}`` —
      non-NULL values not matching (Java regex, ``rlike``).
    * ``{"check": "finite", "column": c}`` — non-NULL numeric values
      that are NaN or ±Inf (the feature-matrix poison ``in_range``
      cannot see: NaN compares false everywhere).
    * ``{"check": "unique", "columns": [c, ...]}`` — violations =
      ``n_rows − n_distinct`` over the key (0 iff the key is unique).
    * ``{"check": "row_count", "min": lo, "max": hi}`` — violations =
      distance of the row count from the allowed band.
    * ``{"check": "fk", "column": c, "ref": DataFrame,
      "ref_column": rc}`` — non-NULL values with no match in
      ``ref[rc]`` (left-anti count; broadcast when the ref is small).

    Returns ``(check_id, check, target, n_rows, n_violations, passed)``
    ordered by ``check_id`` (the position in ``checks``). ``passed`` is
    1 iff ``n_violations = 0``. All row-level + unique checks share ONE
    aggregate scan; each fk check adds one anti-join count on its own
    reference table.
    """
    if not checks:
        raise ValueError("checks must be non-empty")
    for spec in checks:
        if spec.get("check") not in _ALL_CHECKS:
            raise ValueError(
                f"unknown check {spec.get('check')!r}; "
                f"expected one of {_ALL_CHECKS}"
            )

    aggs = [F.count(F.lit(1)).alias("__n")]
    scalar_slots: list[tuple[int, dict, str]] = []  # (check_id, spec, agg alias)
    fk_slots: list[tuple[int, dict]] = []
    for i, spec in enumerate(checks):
        kind = spec["check"]
        alias = f"__v{i}"
        if kind in _ROW_CHECKS:
            aggs.append(
                F.sum(_violation_expr(spec).cast("long")).alias(alias)
            )
            scalar_slots.append((i, spec, alias))
        elif kind == "unique":
            cols = list(spec["columns"])
            if not cols:
                raise ValueError("unique needs a non-empty columns list")
            # count_distinct(a, b) skips rows where ANY key component is
            # NULL, which would report those rows as false violations.
            # Wrapping the key in a struct makes the comparison null-safe
            # (struct equality treats NULL = NULL, like SQL's SELECT
            # DISTINCT), so every row is counted and only true key
            # collisions — including NULL-key collisions — violate.
            aggs.append(
                F.count_distinct(
                    F.struct(*[F.col(c) for c in cols])
                ).alias(alias)
            )
            scalar_slots.append((i, spec, alias))
        elif kind == "row_count":
            scalar_slots.append((i, spec, "__n"))
        else:  # fk — separate anti-join plan
            fk_slots.append((i, spec))

    agg_row = table.agg(*aggs)

    # ONE aggregate row -> one struct per check -> inline explode.
    # A union of per-check selects over agg_row would re-plan (and at
    # execution re-SCAN) the aggregate once per check; inline keeps a
    # single Aggregate subtree in the plan regardless of check count
    # (pinned by test_expect_single_scan_for_row_checks).
    structs = []
    for i, spec, alias in scalar_slots:
        kind = spec["check"]
        if kind == "unique":
            # null-safe struct distinct: n_rows - distinct key tuples.
            # Rows whose key contains NULLs collide only with identical
            # NULL patterns (SELECT DISTINCT semantics); whether NULL
            # keys are acceptable at all belongs to not_null checks.
            viol = F.col("__n") - F.col(alias)
        elif kind == "row_count":
            lo, hi = spec.get("min"), spec.get("max")
            if lo is None and hi is None:
                raise ValueError("row_count needs min and/or max")
            viol = F.lit(0).cast("long")
            if lo is not None:
                viol = viol + F.greatest(
                    F.lit(int(lo)) - F.col("__n"), F.lit(0)
                )
            if hi is not None:
                viol = viol + F.greatest(
                    F.col("__n") - F.lit(int(hi)), F.lit(0)
                )
        else:
            viol = F.coalesce(F.col(alias), F.lit(0))
        structs.append(
            F.struct(
                F.lit(i).alias("check_id"),
                F.lit(kind).alias("check"),
                F.lit(_target(spec)).alias("target"),
                F.col("__n").cast("long").alias("n_rows"),
                viol.cast("long").alias("n_violations"),
            )
        )
    pieces = []
    if structs:
        pieces.append(agg_row.select(F.inline(F.array(*structs))))
    for i, spec in fk_slots:
        c, ref = spec["column"], spec["ref"]
        rc = spec.get("ref_column", c)
        probe = table.select(F.col(c).alias("__fk")).where(
            F.col("__fk").isNotNull()
        )
        missing = probe.join(
            ref.select(F.col(rc).alias("__fk")).distinct(),
            "__fk",
            "left_anti",
        )
        pieces.append(
            missing.agg(F.count(F.lit(1)).alias("__miss"))
            .crossJoin(agg_row.select(F.col("__n")))
            .select(
                F.lit(i).alias("check_id"),
                F.lit("fk").alias("check"),
                F.lit(_target(spec)).alias("target"),
                F.col("__n").cast("long").alias("n_rows"),
                F.col("__miss").cast("long").alias("n_violations"),
            )
        )

    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out.withColumn(
        "passed", (F.col("n_violations") == 0).cast("int")
    ).orderBy("check_id")


def k_anonymity(
    table: DataFrame,
    quasi_cols: "list[str]",
    k: int = 5,
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination (Sweeney
    2002): every row whose (quasi_cols) equivalence class has fewer
    than ``k`` members is re-identifiable to that class size — the
    privacy gate before a dataset with demographic-ish columns leaves
    the pipeline. Returns the per-class audit:
    ``quasi_cols + (class_size, violates)`` for every DISTINCT class
    (one row per class, not per row — at 100 TB the class table is
    the small output), ordered smallest class first so the worst
    exposures lead. NULL is a value like any other (a NULL-laden rare
    combination identifies just as well).

    One hash aggregate with map-side combine. Suppression/
    generalization is the caller's policy decision; the audit joined
    back on the quasi columns marks the rows to drop.
    """
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if k < 2:
        raise ValueError("k must be >= 2")
    return (
        table.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).cast("long").alias("class_size"))
        .withColumn("violates", (F.col("class_size") < k).cast("int"))
        .orderBy("class_size", *quasi_cols)
    )
