"""Semi-structured (JSON) column handling: schema profiling and typed
flattening — the first two operations every pipeline runs on tool-call
payloads, API event bodies, and model-output metadata before the
fields can feed features.

* :func:`json_profile` — per top-level key: presence count/rate and
  the observed value-type distribution (object / array / boolean /
  bigint / double / null / string). The drift guard: a provider
  renaming ``arguments`` → ``args`` or numbers arriving as strings
  shows up here before it silently nulls a feature column.
* :func:`json_flatten` — extract declared keys into typed columns
  (``get_json_object`` literal paths + cast), the serving-side
  projection once the schema is agreed.

Scale notes: the profile is ONE ``from_json`` into ``map<string,
string>`` (JVM parser, dynamic keys — ``get_json_object`` needs
literal paths so it cannot enumerate unknown keys) + one map explode
+ one (key, type) aggregate with map-side combine; the flatten is a
pure codegen projection. Malformed JSON rows surface as key
``"(malformed)"`` rather than vanishing.

Known coercion limit (documented, asserted in tests): ``from_json``
into a string map unquotes scalars, so the STRING ``"1"`` and the
NUMBER ``1`` both arrive as ``1`` and classify as ``bigint`` — quote
information is not preserved by the map coercion. Keys whose true
string values are numeric-looking therefore over-report numeric
types; the flatten path (explicit types) is unaffected.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_INT_RE = r"^-?\d+$"
_FLOAT_RE = r"^-?(\d+\.\d*|\.\d+|\d+)([eE][+-]?\d+)?$"


def _value_type(v):
    return (
        F.when(v.isNull(), F.lit("null"))
        .when(v.startswith("{"), F.lit("object"))
        .when(v.startswith("["), F.lit("array"))
        .when(v.isin("true", "false"), F.lit("boolean"))
        .when(v.rlike(_INT_RE), F.lit("bigint"))
        .when(v.rlike(_FLOAT_RE), F.lit("double"))
        .otherwise(F.lit("string"))
    )


def json_profile(
    df: DataFrame,
    json_col: str,
    top_k_types: int = 8,
) -> DataFrame:
    """Profile a JSON string column's top-level structure.

    Returns one row per ``(key, value_type)``:
    ``(key, value_type, n, key_rate, type_rate)`` where ``key_rate`` =
    rows carrying the key / total rows and ``type_rate`` = this type's
    share of the key's occurrences. Rows that fail to parse as a JSON
    object are reported under key ``"(malformed)"`` (NULL input under
    ``"(missing)"``), so the profile always accounts for every row.
    """
    if top_k_types < 1:
        raise ValueError("top_k_types must be >= 1")
    j = F.col(json_col)
    parsed = df.select(
        j.alias("__j"),
        F.from_json(j, "map<string,string>").alias("__m"),
    )
    total = parsed.count()
    if total == 0:
        raise ValueError("empty input")
    # ONE pass over the parsed stream for both the sentinel counts and
    # the (key, type) contingency: explode_outer emits exactly one
    # (null, null) row for every missing/malformed payload (their map
    # is NULL), so the sentinel lane rides the same generator as the
    # key lane and the upstream parse/synthesis lineage is evaluated
    # once instead of once per output leg. A well-formed EMPTY object
    # also explodes to (null, null) — dropped below, exactly as plain
    # explode dropped it before.
    sentinel = (
        F.when(F.col("__j").isNull(), F.lit("(missing)"))
        .when(F.col("__m").isNull(), F.lit("(malformed)"))
        .otherwise(F.lit(None))
    )
    ex = parsed.select(
        sentinel.alias("__sentinel"),
        F.explode_outer("__m").alias("key", "__v"),
    ).where(F.col("__sentinel").isNotNull() | F.col("key").isNotNull())
    counts = (
        ex.groupBy(
            F.col("__sentinel").isNotNull().alias("__is_sentinel"),
            F.coalesce("__sentinel", F.col("key")).alias("key"),
            F.when(F.col("__sentinel").isNotNull(), F.lit("-"))
            .otherwise(_value_type(F.col("__v")))
            .alias("value_type"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        # (key, type)-grain rows only — materialized so the sentinel
        # and key legs below don't each re-run the parse pass
        .localCheckpoint()
    )
    bad = counts.where(F.col("__is_sentinel")).select(
        "key",
        F.lit("-").alias("value_type"),
        "n",
        F.round(F.col("n") / F.lit(float(total)), 6).alias("key_rate"),
        F.lit(1.0).alias("type_rate"),
    )
    kv = counts.where(~F.col("__is_sentinel")).select(
        "key", "value_type", "n"
    )
    from pyspark.sql import Window

    wk = Window.partitionBy("key")
    wr = Window.partitionBy("key").orderBy(F.desc("n"), F.asc("value_type"))
    good = (
        kv.withColumn("__keytot", F.sum("n").over(wk))
        .withColumn("__r", F.row_number().over(wr))
        .where(F.col("__r") <= top_k_types)
        .select(
            "key",
            "value_type",
            "n",
            F.round(F.col("__keytot") / F.lit(float(total)), 6).alias(
                "key_rate"
            ),
            F.round(F.col("n") / F.col("__keytot"), 6).alias("type_rate"),
        )
    )
    return good.unionByName(bad).orderBy("key", F.desc("n"), "value_type")


def json_flatten(
    df: DataFrame,
    json_col: str,
    fields: Mapping[str, str],
    prefix: str = "",
) -> DataFrame:
    """Extract declared top-level (or ``$.a.b`` dotted-path) fields
    into typed columns: ``fields`` maps JSON path suffix → Spark cast
    type (e.g. ``{"name": "string", "latency_ms": "double",
    "meta.retries": "int"}``). Unparseable / missing values become
    NULL (``try``-cast semantics). Pure codegen projection."""
    if not fields:
        raise ValueError("fields must be non-empty")
    cols = [F.col(c) for c in df.columns]
    for path, typ in fields.items():
        name = prefix + path.replace(".", "_")
        cols.append(
            F.get_json_object(F.col(json_col), f"$.{path}")
            .cast(typ)
            .alias(name)
        )
    return df.select(*cols)
