"""ReFeX recursive feature extraction as a Spark driver loop.

Each generation is a fixed, small pipeline of Spark jobs (SURVEY.md §2.3):

1. neighbor aggregation — two physical strategies:
   * **edges mode** (general graphs): ONE join of the neighbor relation
     against the previous generation's wide frame + ONE hash aggregation
     with every ``agg(col)`` expression fused (map-side partial agg,
     whole-stage codegen; AQE skew-splits this shuffle);
   * **chain mode** (lag-1 temporal adjacency, the transcript case):
     neighbor aggregates are just ``lag``/``lead`` window expressions
     over ``(conv_id, turn_idx)`` — NO join, NO new shuffle; every
     generation reuses the conversation partitioning, so the whole
     recursion costs one shuffle total at any scale;
2. horizontal concat — outer join + ``na.fill(0)`` in edges mode
   (reference NaN→0 invariant, extract.py:112,128-133); a plain column
   append in chain mode (neighborless rows get the same 0s the
   reference's concat+fillna would give them);
3. pruning — one melt+histogram aggregation (also yields the row count,
   no separate count job), driver binning, one Chebyshev aggregation
   pass, driver component grouping;
4. bookkeeping — retained names per generation on the driver; retained
   column *values* are frozen by reference into the generation's cached
   (or checkpointed) frame, so a feature dropped by a LATER generation
   still reaches the final output, exactly like the reference's
   ``_final_features`` dict.

Per generation the engine runs exactly TWO actions (histogram +
Chebyshev) plus optional checkpoint writes — no per-generation count()
or intermediate kept-frame materialization; the final frame is one
multi-join at finalize.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphrole_spark.operators.aggregate import AGG_FUNCS as _AGG_FUNCS
from graphrole_spark.operators.aggregate import neighbor_aggregate
from graphrole_spark.operators.binning import melt_histogram
from graphrole_spark.operators.pruning import chebyshev_distances
from graphrole_spark.operators.binning import binned_columns_from_hists
from graphrole_spark.operators.seeds import seed_features, symmetrize
from graphrole_spark.oracle.binning import bin_boundaries
from graphrole_spark.oracle.prune import group_feature_names, select_features_to_drop

_CHAIN_AGGS = {"sum", "mean", "avg", "max", "min"}


class RecursiveFeatureExtractor:
    """Distributed ReFeX over an edge DataFrame (src, dst, weight) or a
    lag-1 conversation chain.

    :param edges: edge relation; for undirected graphs pass each edge
        once (symmetrization is internal, matching networkx degree
        semantics). May be None in chain mode.
    :param directed: out-neighbor recursion + directed egonets when True
    :param nodes: optional DataFrame with a ``node`` column to keep
        isolated nodes in the output (reference keeps them, 0-filled)
    :param node_attributes: optional DataFrame (node, attr...) whose
        numeric columns become ``attribute_<name>`` seed features
    :param seed_frame: precomputed generation-0 features (node, f...);
        may carry extra passthrough key columns named in ``chain_keys``
    :param chain_keys: (conv_col, idx_col) — activates chain mode:
        neighbor aggregation via lag/lead windows instead of a join.
        Requires ``seed_frame`` containing those columns.
    :param checkpoint_dir: when set, per-generation parquet checkpoints +
        ``_lineage.json`` are written there and extraction can resume
    """

    def __init__(
        self,
        edges: Optional[DataFrame] = None,
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
        chain_keys: Optional[Tuple[str, str]] = None,
    ) -> None:
        for agg in aggs:
            if agg not in _AGG_FUNCS:
                raise ValueError(f"unsupported agg '{agg}'; use {sorted(_AGG_FUNCS)}")
        self.chain_keys = tuple(chain_keys) if chain_keys else None
        if self.chain_keys:
            if seed_frame is None:
                raise ValueError("chain mode requires seed_frame with the key columns")
            missing = set(self.chain_keys) - set(seed_frame.columns)
            if missing:
                raise ValueError(f"seed_frame lacks chain key columns {missing}")
            bad = set(aggs) - _CHAIN_AGGS
            if bad:
                raise ValueError(f"chain mode supports aggs {_CHAIN_AGGS}; got {bad}")
            self.edges = None
            self.spark = seed_frame.sparkSession
        else:
            if edges is None:
                raise ValueError("either edges or chain_keys must be provided")
            if "weight" not in edges.columns:
                edges = edges.withColumn("weight", F.lit(1.0))
            self.edges = edges.select("src", "dst", "weight")
            self.spark = edges.sparkSession
            if self.edges.limit(1).count() == 0:
                raise ValueError("input edge DataFrame must contain at least one edge")
            nbrs = self.edges if directed else symmetrize(self.edges)
            self.neighbor_rel = nbrs.select("src", "dst").distinct()

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

        self.generation_count = 0
        self._generation_dict: Dict[int, Dict[str, None]] = {}
        # feature columns are immutable and the node set is fixed after
        # gen 0, so a column's histogram never changes — cache it and
        # melt only the columns first seen this generation
        self._hist_cache: Dict[str, tuple] = {}
        self._state: Optional[DataFrame] = None      # cached combined frame
        self._active_cols: List[str] = []            # surviving feature names
        self._gen_frames: Dict[int, DataFrame] = {}  # gen -> (node, retained...)
        self._lineage: List[dict] = []
        self._final: Optional[DataFrame] = None

    # -- public ---------------------------------------------------------

    def extract_features(self) -> DataFrame:
        """Run the recursion (idempotent; memoized like the reference)."""
        if self._final is not None:
            return self._final
        self._update(self._seed_features(), 0)
        for gen in range(1, self.max_generations):
            self.generation_count = gen
            if not self._update(self._next_features(), gen):
                break
        self._final = self._finalize()
        if self.checkpoint_dir:
            self._write_lineage(done=True)
        return self._final

    def retained_by_generation(self) -> Dict[int, List[str]]:
        return {g: list(d.keys()) for g, d in self._generation_dict.items()}

    @property
    def lineage(self) -> List[dict]:
        return list(self._lineage)

    # -- generation steps ----------------------------------------------------

    def _seed_features(self) -> DataFrame:
        if self.seed_frame is not None:
            return self.seed_frame
        return seed_features(
            self.edges,
            directed=self.directed,
            nodes=self.nodes,
            node_attributes=self.node_attributes,
            attributes_include=self.attributes_include,
            attributes_exclude=self.attributes_exclude,
        )

    def _prev_cols(self) -> List[str]:
        return list(self._generation_dict[self.generation_count - 1].keys())

    def _next_features(self) -> Optional[DataFrame]:
        """New-generation columns. In edges mode: a (node, cols) frame to
        outer-join. In chain mode: None — columns are appended in-place
        by :meth:`_combine` via window expressions."""
        if self.chain_keys:
            return None
        return neighbor_aggregate(
            self.neighbor_rel, self._state, self._prev_cols(), self.aggs
        )

    def _chain_exprs(self) -> List:
        """lag/lead neighbor aggregates for the chain graph — appended as
        columns; neighborless rows evaluate to the 0 the reference's
        concat+fillna(0) assigns them (mean: 0/0 → null → filled)."""
        conv, idx = self.chain_keys
        w = Window.partitionBy(conv).orderBy(idx)
        exprs = []
        for agg in self.aggs:
            for c in self._prev_cols():
                l, r = F.lag(c).over(w), F.lead(c).over(w)
                if agg == "sum":
                    e = F.coalesce(l, F.lit(0.0)) + F.coalesce(r, F.lit(0.0))
                elif agg in ("mean", "avg"):
                    cnt = l.isNotNull().cast("double") + r.isNotNull().cast("double")
                    tot = F.coalesce(l, F.lit(0.0)) + F.coalesce(r, F.lit(0.0))
                    # guard cnt=0 (ANSI mode would raise on x/0)
                    e = F.when(cnt > 0, tot / cnt).otherwise(F.lit(0.0))
                elif agg == "max":
                    e = F.coalesce(F.greatest(l, r), F.lit(0.0))
                else:  # min — least() ignores nulls like greatest()
                    e = F.coalesce(F.least(l, r), F.lit(0.0))
                exprs.append(e.alias(f"{c}({agg})"))
        return exprs

    def _combine(self, new_frame: Optional[DataFrame], gen: int) -> Tuple[DataFrame, List[str]]:
        keys = list(self.chain_keys) if self.chain_keys else []
        if gen == 0:
            combined = new_frame
            new_cols = [c for c in new_frame.columns if c != "node" and c not in keys]
            value_cols = list(new_cols)
            return combined.na.fill(0.0, value_cols), new_cols
        base = self._state.select("node", *keys, *self._active_cols)
        if self.chain_keys:
            exprs = self._chain_exprs()
            combined = base.select("node", *keys, *self._active_cols, *exprs)
            new_cols = [
                f"{c}({agg})" for agg in self.aggs for c in self._prev_cols()
            ]
        else:
            combined = base.join(new_frame, "node", "left")
            new_cols = [c for c in new_frame.columns if c != "node"]
            combined = combined.na.fill(0.0, new_cols)
        return combined, new_cols

    def _tiny_query_conf(self):
        """Context: disable AQE for the per-generation mini-actions.

        The histogram and Chebyshev collects move a few KB — AQE's
        per-stage re-optimization adds fixed latency × 2 actions ×
        generations with nothing to adapt. The big shuffles (neighbor
        join in edges mode) run outside this scope with AQE on.
        """
        import contextlib

        spark = self.spark

        @contextlib.contextmanager
        def ctx():
            prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            try:
                yield
            finally:
                spark.conf.set("spark.sql.adaptive.enabled", prev)

        return ctx()

    def _update(self, new_frame: Optional[DataFrame], gen: int) -> List[str]:
        t0 = time.time()
        combined, new_cols = self._combine(new_frame, gen)
        combined = combined.persist()
        value_cols = self._active_cols + [c for c in new_cols if c not in self._active_cols] \
            if gen > 0 else new_cols

        # one melt+histogram pass over the NEW columns only: bin
        # boundaries AND the row count (old columns come from the cache)
        t_hist = time.time()
        to_melt = [c for c in value_cols if c not in self._hist_cache]
        if to_melt:
            with self._tiny_query_conf():
                fresh = melt_histogram(combined, to_melt)
            self._hist_cache.update(fresh)
        hists = {c: self._hist_cache[c] for c in value_cols}
        t_hist = time.time() - t_hist
        first = value_cols[0]
        row_count = int(hists[first][1].sum()) if len(hists[first][1]) else 0
        bounds = {
            c: bin_boundaries(hists[c][0], hists[c][1], frac=self.binning_frac)
            for c in value_cols
        }
        # persist the binned projection: without the barrier Catalyst
        # collapses it into the pairwise aggregate and re-evaluates every
        # bin expression once per feature PAIR (O(F²·bounds) per row)
        binned = binned_columns_from_hists(
            combined.select("node", *value_cols), value_cols, bounds
        ).persist()
        t_cheb = time.time()
        with self._tiny_query_conf():
            dists = chebyshev_distances(binned, value_cols)
        t_cheb = time.time() - t_cheb
        binned.unpersist()
        groups = group_feature_names(value_cols, dists, gen)
        to_drop = select_features_to_drop(groups, self._generation_dict)

        retained = sorted(set(new_cols) - set(to_drop))
        self._generation_dict[gen] = dict.fromkeys(retained)
        self._active_cols = [c for c in value_cols if c not in to_drop]

        state = combined
        gen_frame = combined.select("node", *retained) if retained else None
        if self.checkpoint_dir:
            state, gen_frame = self._checkpoint(combined, retained, gen)
        self._state = state
        if retained:
            self._gen_frames[gen] = gen_frame

        self._lineage.append(
            {
                "generation": gen,
                "retained": retained,
                "dropped": sorted(to_drop),
                "row_count": row_count,
                "n_features": len(value_cols),
                "histogram_sec": round(t_hist, 3),
                "chebyshev_sec": round(t_cheb, 3),
                "seconds": round(time.time() - t0, 3),
                "rows_per_sec": round(row_count / max(time.time() - t0, 1e-9), 1),
            }
        )
        if self.checkpoint_dir:
            self._write_lineage(done=False)
        return retained

    def _finalize(self) -> DataFrame:
        gens = sorted(self._gen_frames)
        out = self._gen_frames[gens[0]]
        for g in gens[1:]:
            out = out.join(self._gen_frames[g], "node", "left")
            out = out.na.fill(0.0, list(self._generation_dict[g].keys()))
        if self.chain_keys:
            keys = list(self.chain_keys)
            out = self._state.select("node", *keys).join(out, "node", "left")
        return out

    # -- persistence ----------------------------------------------------------

    def _checkpoint(self, combined: DataFrame, retained: List[str], gen: int):
        """Parquet the generation (state = node+keys+active, retained slice
        separately) and re-read — truncates lineage AND provides the
        resume point; earlier cached state can then be released."""
        keys = list(self.chain_keys) if self.chain_keys else []
        base = os.path.join(self.checkpoint_dir, f"gen={gen}")
        state_path = os.path.join(base, "state")
        combined.select("node", *keys, *self._active_cols).write.mode(
            "overwrite"
        ).parquet(state_path)
        state = self.spark.read.parquet(state_path)
        gen_frame = None
        if retained:
            ret_path = os.path.join(base, "retained")
            combined.select("node", *retained).write.mode("overwrite").parquet(ret_path)
            gen_frame = self.spark.read.parquet(ret_path)
        combined.unpersist()
        if self._state is not None:
            self._state.unpersist()
        return state, gen_frame

    def _write_lineage(self, done: bool) -> None:
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        with open(os.path.join(self.checkpoint_dir, "_lineage.json"), "w") as fh:
            json.dump(
                {
                    "generations": self._lineage,
                    "generation_dict": self.retained_by_generation(),
                    "active_cols": self._active_cols,
                    "aggs": self.aggs,
                    "directed": self.directed,
                    "chain_keys": list(self.chain_keys) if self.chain_keys else None,
                    "done": done,
                },
                fh,
                indent=2,
            )

    @classmethod
    def resume(cls, spark, checkpoint_dir: str, edges: Optional[DataFrame] = None, **kwargs):
        """Rebuild extractor state from a checkpoint directory and continue.

        Reads ``_lineage.json`` + per-generation parquet, so a killed run
        restarts at the first incomplete generation instead of recomputing
        from the scan (north_rule resumability).
        """
        with open(os.path.join(checkpoint_dir, "_lineage.json")) as fh:
            manifest = json.load(fh)
        if manifest.get("chain_keys"):
            kwargs.setdefault("chain_keys", tuple(manifest["chain_keys"]))
            # placeholder seed frame; replaced by checkpointed state below
            kwargs.setdefault(
                "seed_frame",
                spark.read.parquet(os.path.join(checkpoint_dir, "gen=0", "state")),
            )
        inst = cls(edges=edges, checkpoint_dir=checkpoint_dir, **kwargs)
        gens = sorted(int(g) for g in manifest["generation_dict"])
        last = gens[-1]
        inst._generation_dict = {
            int(g): dict.fromkeys(names)
            for g, names in manifest["generation_dict"].items()
        }
        inst._lineage = manifest["generations"]
        inst._active_cols = manifest["active_cols"]
        inst.generation_count = last
        inst._state = spark.read.parquet(
            os.path.join(checkpoint_dir, f"gen={last}", "state")
        )
        for g in gens:
            ret_path = os.path.join(checkpoint_dir, f"gen={g}", "retained")
            if manifest["generation_dict"].get(str(g)) and os.path.exists(ret_path):
                inst._gen_frames[g] = spark.read.parquet(ret_path)
        if not manifest.get("done") and manifest["generation_dict"].get(str(last)):
            for gen in range(last + 1, inst.max_generations):
                inst.generation_count = gen
                if not inst._update(inst._next_features(), gen):
                    break
        inst._final = inst._finalize()
        inst._write_lineage(done=True)
        return inst
