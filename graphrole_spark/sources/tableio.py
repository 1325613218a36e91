"""Table IO abstraction: Iceberg when available, parquet layout otherwise.

The north rule targets Iceberg tables; this sandbox has no Iceberg
runtime jar, so ``TableIO`` exposes one read/write surface and picks
the format at runtime. The parquet layout emulates the table contract:
data files bucketed by ``conv_id`` hash (co-locates every
per-conversation window/join), plus stable ``(conv_id, turn_idx)``
sort within files for the per-turn ordering invariant.
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# pluggable reader registry (reference: graph/interface/__init__.py:12-17
# keeps a registry of source adapters; here the sources are table
# formats). register_reader extends the engine to new formats without
# touching TableIO.
READERS: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "parquet": lambda spark, path: spark.read.parquet(path),
    "iceberg": lambda spark, path: spark.read.format("iceberg").load(path),
    "json": lambda spark, path: spark.read.json(path),
    "csv": lambda spark, path: spark.read.option("header", "true").csv(path),
    "orc": lambda spark, path: spark.read.orc(path),
}


def register_reader(
    fmt: str, builder: Callable[[SparkSession, str], DataFrame]
) -> None:
    READERS[fmt] = builder


def get_reader(fmt: str) -> Callable[[SparkSession, str], DataFrame]:
    if fmt not in READERS:
        raise ValueError(f"unknown source format '{fmt}'; known: {sorted(READERS)}")
    return READERS[fmt]


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


class TableIO:
    def __init__(self, spark: SparkSession, prefer_iceberg: bool = True) -> None:
        self.spark = spark
        self.use_iceberg = prefer_iceberg and iceberg_available(spark)

    def read(self, path_or_table: str, fmt: str | None = None) -> DataFrame:
        if fmt is None:
            fmt = "iceberg" if self.use_iceberg else "parquet"
        return get_reader(fmt)(self.spark, path_or_table)

    def write_transcripts(
        self, df: DataFrame, path_or_table: str, buckets: int = 64
    ) -> None:
        """Write with the conversation-bucketed, turn-sorted layout."""
        if self.use_iceberg:
            (
                df.writeTo(path_or_table)
                .partitionedBy(F.bucket(buckets, F.col("conv_id")))
                .createOrReplace()
            )
            return
        (
            df.withColumn(
                "bucket", F.pmod(F.xxhash64("conv_id"), F.lit(buckets)).cast("int")
            )
            .repartition(buckets, "bucket")
            .sortWithinPartitions("conv_id", "turn_idx")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(path_or_table)
        )

    def read_transcripts(self, path_or_table: str) -> DataFrame:
        df = self.read(path_or_table)
        return df.drop("bucket") if "bucket" in df.columns else df
