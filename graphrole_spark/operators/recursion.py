"""ReFeX recursive feature extraction as a Spark driver loop.

Each generation is a fixed, small pipeline of Spark jobs (SURVEY.md §2.3):

1. neighbor aggregation — ONE join of the neighbor relation against the
   previous generation's wide feature frame + ONE hash aggregation with
   every ``agg(col)`` expression fused (map-side partial aggregation,
   whole-stage codegen; this is the shuffle that dominates at 10^12
   turns and the one AQE skew-splits);
2. horizontal concat — outer join on the node key + ``na.fill(0)``
   (the reference's NaN→0 invariant, extract.py:112,128-133);
3. pruning — distributed histogram → driver binning → one Chebyshev
   aggregation pass → driver component grouping (operators/{binning,
   pruning}.py);
4. bookkeeping — retained names per generation on the driver, frames
   persisted/checkpointed, lineage JSON for resumability.

Semantics match the reference driver (graphrole/features/extract.py:65-142)
and are validated against the numpy oracle via allclose in
tests/test_spark_refex.py.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphrole_spark.operators.aggregate import AGG_FUNCS as _AGG_FUNCS
from graphrole_spark.operators.aggregate import neighbor_aggregate
from graphrole_spark.operators.pruning import prune_features_spark
from graphrole_spark.operators.seeds import node_set, seed_features, symmetrize


class RecursiveFeatureExtractor:
    """Distributed ReFeX over an edge DataFrame (src, dst, weight).

    :param edges: edge relation; for undirected graphs pass each edge once
        (symmetrization is internal, matching networkx degree semantics)
    :param directed: out-neighbor recursion + directed egonets when True
    :param nodes: optional DataFrame with a ``node`` column to keep
        isolated nodes in the output (reference keeps them, 0-filled)
    :param node_attributes: optional DataFrame (node, attr...) whose
        numeric columns become ``attribute_<name>`` seed features
    :param checkpoint_dir: when set, per-generation parquet checkpoints +
        ``_lineage.json`` are written there and extraction can resume
    """

    def __init__(
        self,
        edges: DataFrame,
        directed: bool = False,
        max_generations: int = 10,
        aggs: Sequence[str] = ("sum", "mean"),
        nodes: Optional[DataFrame] = None,
        node_attributes: Optional[DataFrame] = None,
        attributes_include: Optional[Sequence[str]] = None,
        attributes_exclude: Optional[Sequence[str]] = None,
        checkpoint_dir: Optional[str] = None,
        binning_frac: float = 0.5,
        seed_frame: Optional[DataFrame] = None,
    ) -> None:
        for agg in aggs:
            if agg not in _AGG_FUNCS:
                raise ValueError(f"unsupported agg '{agg}'; use {sorted(_AGG_FUNCS)}")
        if "weight" not in edges.columns:
            edges = edges.withColumn("weight", F.lit(1.0))
        self.edges = edges.select("src", "dst", "weight")
        self.directed = directed
        self.max_generations = max_generations
        self.aggs = list(aggs)
        self.nodes = nodes
        self.node_attributes = node_attributes
        self.attributes_include = attributes_include
        self.attributes_exclude = attributes_exclude
        self.checkpoint_dir = checkpoint_dir
        self.binning_frac = binning_frac
        self.seed_frame = seed_frame
        self.spark = edges.sparkSession

        if self.edges.limit(1).count() == 0:
            raise ValueError("input edge DataFrame must contain at least one edge")

        # deduplicated neighbor relation for the recursion (simple-graph
        # semantics: the reference aggregates each neighbor's features once)
        nbrs = self.edges if directed else symmetrize(self.edges)
        self.neighbor_rel = nbrs.select("src", "dst").distinct()

        self.generation_count = 0
        self._generation_dict: Dict[int, Dict[str, None]] = {}
        self._current: Optional[DataFrame] = None  # post-prune working frame
        self._kept: Optional[DataFrame] = None     # every retained column
        self._lineage: List[dict] = []
        self._done = False

    # -- public ---------------------------------------------------------

    def extract_features(self) -> DataFrame:
        """Run the recursion (idempotent; memoized like the reference)."""
        if self._done:
            return self._kept
        self._run_generation_zero()
        for gen in range(1, self.max_generations):
            self.generation_count = gen
            new = self._next_features()
            retained = self._update(new, gen)
            if not retained:
                break
        self._done = True
        if self.checkpoint_dir:
            self._write_lineage()
        return self._kept

    def retained_by_generation(self) -> Dict[int, List[str]]:
        return {g: list(d.keys()) for g, d in self._generation_dict.items()}

    @property
    def lineage(self) -> List[dict]:
        return list(self._lineage)

    # -- generation steps ----------------------------------------------------

    def _run_generation_zero(self) -> None:
        if self.seed_frame is not None:
            seeds = self.seed_frame
        else:
            seeds = seed_features(
                self.edges,
                directed=self.directed,
                nodes=self.nodes,
                node_attributes=self.node_attributes,
                attributes_include=self.attributes_include,
                attributes_exclude=self.attributes_exclude,
            )
        self._update(seeds, 0)

    def _next_features(self) -> DataFrame:
        prev_cols = list(self._generation_dict[self.generation_count - 1].keys())
        return neighbor_aggregate(self.neighbor_rel, self._kept, prev_cols, self.aggs)

    def _update(self, new_frame: DataFrame, gen: int) -> List[str]:
        t0 = time.time()
        new_cols = [c for c in new_frame.columns if c != "node"]
        if self._current is None:
            combined = new_frame
        else:
            combined = self._current.join(new_frame, "node", "outer")
        value_cols = [c for c in combined.columns if c != "node"]
        combined = combined.na.fill(0.0, value_cols).persist()

        to_drop = prune_features_spark(
            combined, value_cols, self._generation_dict, gen, frac=self.binning_frac
        )
        pruned = combined.drop(*to_drop) if to_drop else combined

        retained = sorted(set(new_cols) - set(to_drop))
        self._generation_dict[gen] = dict.fromkeys(retained)

        if self._kept is None:
            kept = pruned.select("node", *retained)
        elif retained:
            kept = self._kept.join(pruned.select("node", *retained), "node", "left")
            kept = kept.na.fill(0.0, retained)
        else:
            kept = self._kept

        self._current, self._kept, row_count = self._materialize(pruned, kept, gen)
        combined.unpersist()
        self._lineage.append(
            {
                "generation": gen,
                "retained": retained,
                "dropped": sorted(to_drop),
                "row_count": row_count,
                "seconds": round(time.time() - t0, 3),
                "rows_per_sec": round(row_count / max(time.time() - t0, 1e-9), 1),
            }
        )
        if self.checkpoint_dir:
            self._write_lineage()
        return retained

    # -- persistence ----------------------------------------------------------

    def _materialize(self, current: DataFrame, kept: DataFrame, gen: int):
        """Cut lineage each generation: either parquet checkpoint (resumable,
        required by the north rule) or persist + count (plan-truncation via
        cache). Without this the physical plan doubles every generation."""
        if self.checkpoint_dir:
            cur_path = os.path.join(self.checkpoint_dir, f"gen={gen}", "current")
            kept_path = os.path.join(self.checkpoint_dir, f"gen={gen}", "kept")
            current.write.mode("overwrite").parquet(cur_path)
            kept.write.mode("overwrite").parquet(kept_path)
            current = self.spark.read.parquet(cur_path)
            kept = self.spark.read.parquet(kept_path)
            return current, kept, current.count()
        current = current.persist()
        kept = kept.persist()
        return current, kept, current.count()

    def _write_lineage(self) -> None:
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        with open(os.path.join(self.checkpoint_dir, "_lineage.json"), "w") as fh:
            json.dump(
                {
                    "generations": self._lineage,
                    "generation_dict": self.retained_by_generation(),
                    "aggs": self.aggs,
                    "directed": self.directed,
                    "done": self._done,
                },
                fh,
                indent=2,
            )

    @classmethod
    def resume(cls, spark, checkpoint_dir: str, edges: DataFrame, **kwargs):
        """Rebuild extractor state from a checkpoint directory and continue.

        Reads ``_lineage.json`` + the last generation's parquet frames, so a
        killed run restarts at the first incomplete generation instead of
        recomputing from the scan (north_rule resumability).
        """
        with open(os.path.join(checkpoint_dir, "_lineage.json")) as fh:
            manifest = json.load(fh)
        inst = cls(edges, checkpoint_dir=checkpoint_dir, **kwargs)
        gens = sorted(int(g) for g in manifest["generation_dict"])
        last = gens[-1]
        inst._generation_dict = {
            int(g): dict.fromkeys(names)
            for g, names in manifest["generation_dict"].items()
        }
        inst._lineage = manifest["generations"]
        inst.generation_count = last
        inst._current = spark.read.parquet(
            os.path.join(checkpoint_dir, f"gen={last}", "current")
        )
        inst._kept = spark.read.parquet(
            os.path.join(checkpoint_dir, f"gen={last}", "kept")
        )
        if manifest.get("done") or not manifest["generation_dict"].get(str(last)):
            inst._done = True
            return inst
        for gen in range(last + 1, inst.max_generations):
            inst.generation_count = gen
            new = inst._next_features()
            if not inst._update(new, gen):
                break
        inst._done = True
        inst._write_lineage()
        return inst
