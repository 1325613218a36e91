"""Transcript table source: load, synthesize, and derive temporal edges.

Canonical input schema (BASELINE.json input_hint):
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)``, key (conv_id, turn_idx), ts non-decreasing per conv.

Synthesis is *fully distributed and deterministic*: every column is a
pure function of (seed, conv ordinal, turn ordinal) built from
``xxhash64`` — ``spark.range`` + JVM expressions end to end, so the same
generator that makes a 10^3-turn test fixture makes a 10^9-turn bench
table without touching the driver. A configurable heavy tail gives a
few conversations ~100x the median length to exercise skew handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

_EPOCH = "2025-01-01 00:00:00"
_TOOLS = ["search", "python", "browser", "editor"]


def load_transcripts(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Read a transcripts table. Uses Iceberg when the runtime has the
    catalog jar (``fmt='iceberg'``), plain parquet otherwise — same
    downstream plan either way."""
    if fmt == "iceberg":
        try:
            return spark.read.format("iceberg").load(path)
        except Exception:  # no Iceberg runtime in this sandbox: fall back
            pass
    return spark.read.parquet(path)


def synthesize_transcripts(
    spark: SparkSession,
    n_convs: int,
    seed: int = 42,
    max_turns: int = 40,
    heavy_tail_every: int = 101,
    heavy_tail_factor: int = 50,
    session_gap_seconds: int = 1800,
    gap_every: int = 7,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic synthetic transcripts (see FIXTURES.md F1).

    Conversation c gets ``2 + (h(c) mod max_turns)`` turns, multiplied by
    ``heavy_tail_factor`` for every ``heavy_tail_every``-th conversation
    (skew knob). Roles alternate user/assistant with every 5th turn a
    tool turn; timestamps advance by seconds-scale gaps with every
    ``gap_every``-th gap exceeding ``session_gap_seconds`` so each long
    conversation spans multiple sessions.
    """
    convs = spark.range(n_convs, numPartitions=partitions)
    h = F.xxhash64(F.col("id"), F.lit(seed))
    base_len = (F.pmod(h, F.lit(max_turns)) + F.lit(2)).cast("int")
    is_heavy = F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 1)), F.lit(heavy_tail_every)) == 0
    n_turns = F.when(is_heavy, base_len * F.lit(heavy_tail_factor)).otherwise(base_len)

    convs = convs.select(
        F.concat(F.lit("c"), F.lpad(F.col("id").cast("string"), 8, "0")).alias("conv_id"),
        F.col("id").alias("conv_ord"),
        n_turns.alias("n_turns"),
    )

    turns = convs.select(
        "conv_id",
        "conv_ord",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )

    th = F.xxhash64(F.col("conv_ord"), F.col("turn_idx"), F.lit(seed))
    role = (
        F.when(F.col("turn_idx") == 0, F.lit("system"))
        .when(F.pmod(F.col("turn_idx"), F.lit(5)) == 3, F.lit("tool"))
        .when(F.pmod(F.col("turn_idx"), F.lit(2)) == 1, F.lit("assistant"))
        .otherwise(F.lit("user"))
    )
    tool = F.when(
        role == "tool",
        F.element_at(
            F.array(*[F.lit(t) for t in _TOOLS]),
            (F.pmod(th, F.lit(len(_TOOLS))) + 1).cast("int"),
        ),
    ).otherwise(F.lit(""))

    # per-turn gap: seconds-scale, with a super-gap starting a new session
    gap = F.when(
        (F.pmod(F.xxhash64(F.col("conv_ord"), F.col("turn_idx"), F.lit(seed + 2)),
                F.lit(gap_every)) == 0) & (F.col("turn_idx") > 0),
        F.lit(session_gap_seconds + 60) + F.pmod(th, F.lit(600)),
    ).otherwise(F.lit(1) + F.pmod(th, F.lit(50)))

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    out = (
        turns.withColumn("gap_s", gap)
        .withColumn(
            "offset_s",
            F.sum("gap_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
            + F.col("conv_ord") * 3,  # stagger conversation start times
        )
        .select(
            "conv_id",
            F.col("turn_idx").cast("int").alias("turn_idx"),
            role.alias("role"),
            F.concat(
                F.col("conv_id"), F.lit("-t"), F.col("turn_idx"), F.lit("-"),
                F.substring(F.sha2(F.concat(F.col("conv_id"), F.col("turn_idx"), F.lit(seed)), 256), 1, 24),
            ).alias("text"),
            tool.alias("tool"),
            (F.to_timestamp(F.lit(_EPOCH)).cast("double") + F.col("offset_s")).cast(
                "timestamp"
            ).alias("ts"),
        )
    )
    return out


def entity_col(conv_col: str = "conv_id", idx_col: str = "turn_idx") -> F.Column:
    """Composite (conv_id, turn_idx) key as one string entity id."""
    return F.concat_ws("#", F.col(conv_col), F.col(idx_col).cast("string"))


def derive_edges(
    transcripts: DataFrame,
    lag_k: int = 1,
    cutoff_ts=None,
) -> DataFrame:
    """Temporal-adjacency edge relation: each turn connects to its k
    preceding turns within the conversation (undirected semantics are
    applied by the consumer). Columns: (src, dst, weight).

    ``cutoff_ts``: point-in-time bound — only turns with ``ts <= cutoff``
    exist in the edge relation (zero-leakage construction: the predicate
    is applied at the scan, before any join).
    """
    t = transcripts
    if cutoff_ts is not None:
        t = t.where(F.col("ts") <= F.lit(cutoff_ts))
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    edges = None
    base = t.select("conv_id", "turn_idx")
    for k in range(1, lag_k + 1):
        e_k = base.select(
            entity_col().alias("src"),
            F.lag(entity_col(), k).over(w).alias("dst"),
        ).where(F.col("dst").isNotNull())
        edges = e_k if edges is None else edges.unionByName(e_k)
    return edges.withColumn("weight", F.lit(1.0))
