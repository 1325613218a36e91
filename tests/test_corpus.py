"""Corpus-assembly operators: packing/split/sampling invariants.

(Exact values are DuckDB-checked via the driver contract; these tests
pin the semantic invariants the SQL comparison can't express.)
"""

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from graphrole_spark.functions.corpus import (
    pack_documents,
    split_assign,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet").persist()


def test_pack_budget_invariant(spark, docs):
    """A sequence exceeds the token budget only when a single document
    does; every doc lands in exactly one sequence."""
    packed = pack_documents(docs, max_tokens=128, shards=4).toPandas()
    assert len(packed) == docs.count()
    assert packed.doc_id.is_unique
    for (_, _), grp in packed.groupby(["shard", "seq_id"]):
        if grp.seq_tokens.iloc[0] > 128 + grp.n_tokens.max():
            raise AssertionError(
                f"overfull sequence beyond one oversized doc: {grp}"
            )
    # contiguity: within a shard, seq ids are ordered with doc order
    for _, grp in packed.sort_values("doc_id").groupby("shard"):
        assert grp.seq_id.is_monotonic_increasing


def test_pack_partitioning_invariance(spark, docs):
    """Packing depends only on (doc_id, text) — reshuffling the input
    must not change a single assignment."""
    a = pack_documents(docs, max_tokens=128, shards=4).toPandas()
    b = pack_documents(docs.repartition(13), max_tokens=128, shards=4).toPandas()
    key = ["doc_id"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a.equals(b)


def test_chunk_reconstruction(spark, docs):
    """Chunks concatenate back to the whitespace-normalized document;
    every chunk respects the token budget."""
    from graphrole_spark.functions.corpus import chunk_documents

    chunks = chunk_documents(docs, max_tokens=32).toPandas()
    assert (chunks.chunk_tokens <= 32).all()
    rebuilt = (
        chunks.sort_values(["doc_id", "chunk_idx"])
        .groupby("doc_id").chunk_text.apply(" ".join)
    )
    orig = (
        docs.select("doc_id", F.regexp_replace(F.trim("text"), " +", " ").alias("t"))
        .toPandas().set_index("doc_id").t
    )
    assert (rebuilt.sort_index() == orig.sort_index()).all()


def test_split_fractions_and_stability(spark, docs):
    s1 = split_assign(docs, val_frac=0.2, test_frac=0.1).toPandas()
    s2 = split_assign(docs.repartition(7), val_frac=0.2, test_frac=0.1).toPandas()
    merged = s1.merge(s2, on="doc_id")
    assert (merged.split_x == merged.split_y).all()
    fr = s1.split.value_counts(normalize=True)
    assert 0.6 < fr.get("train", 0) < 0.8
    assert 0.1 < fr.get("val", 0) < 0.3
    assert 0.03 < fr.get("test", 0) < 0.2
    # a different salt re-deals the split
    s3 = split_assign(docs, val_frac=0.2, test_frac=0.1, salt="v2").toPandas()
    m2 = s1.merge(s3, on="doc_id")
    assert (m2.split_x != m2.split_y).any()


_DOC_TEXT = st.text(alphabet=" abcdefgh.!3", min_size=0, max_size=60)


@given(
    st.lists(_DOC_TEXT, min_size=1, max_size=12),
    st.integers(min_value=1, max_value=16),
)
@settings(max_examples=8, deadline=None)
def test_chunk_pack_properties_random_docs(spark, texts, max_tokens):
    """Random corpora: chunking reconstructs the normalized text and
    respects the budget; packing covers every doc exactly once."""
    from graphrole_spark.functions.corpus import chunk_documents, pack_documents
    from graphrole_spark.functions.text import token_count

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    chunks = chunk_documents(df, max_tokens=max_tokens).toPandas()
    assert (chunks.chunk_tokens <= max_tokens).all()
    rebuilt = (
        chunks.sort_values(["doc_id", "chunk_idx"])
        .groupby("doc_id").chunk_text.apply(" ".join)
    )
    norm = {
        r["doc_id"]: r["t"]
        for r in df.select(
            "doc_id", F.regexp_replace(F.trim("text"), " +", " ").alias("t")
        ).collect()
    }
    for d, text in norm.items():
        assert rebuilt[d] == text
    # chunk token totals equal the whitespace token count
    counts = {
        r["doc_id"]: r["n"]
        for r in df.select("doc_id", token_count(F.col("text")).alias("n")).collect()
    }
    sums = chunks.groupby("doc_id").chunk_tokens.sum()
    for d, n in counts.items():
        # empty text still produces one chunk of its single empty token
        assert sums[d] == max(n, 1)

    packed = pack_documents(df, max_tokens=max_tokens, shards=3).toPandas()
    assert sorted(packed.doc_id) == list(range(len(texts)))
    assert packed.doc_id.is_unique


def test_null_text_handled(spark):
    """NULL text behaves like the empty document in pack/chunk (no
    null-keyed sequences, no dropped rows)."""
    from graphrole_spark.functions.corpus import chunk_documents, pack_documents

    df = spark.createDataFrame(
        [(1, "a b c"), (2, None), (3, "")], "doc_id long, text string"
    )
    packed = pack_documents(df, max_tokens=2, shards=2).toPandas()
    assert sorted(packed.doc_id) == [1, 2, 3]
    assert packed.seq_id.notna().all() and packed.n_tokens.notna().all()
    chunks = chunk_documents(df, max_tokens=2).toPandas()
    null_doc = chunks[chunks.doc_id == 2]
    assert len(null_doc) == 1 and null_doc.chunk_text.iloc[0] == ""


def test_stratified_sample_counts(spark, docs):
    from graphrole_spark.functions.text import language_guess

    out = stratified_sample(docs, language_guess(F.col("text")), 10).toPandas()
    assert (out.groupby("stratum").size() <= 10).all()
    assert out.doc_id.is_unique


def test_pack_strict_never_overflows(spark, docs):
    """boundary='strict' (ADVICE r02): a multi-document sequence never
    exceeds the budget; only oversized single docs may. Assignments match
    a pure-python first-fit reference per shard."""
    packed = pack_documents(docs, max_tokens=128, shards=4, boundary="strict").toPandas()
    assert len(packed) == docs.count()
    assert packed.doc_id.is_unique
    for (_, _), grp in packed.groupby(["shard", "seq_id"]):
        if len(grp) > 1:
            assert grp.seq_tokens.iloc[0] <= 128, grp
        assert (grp.seq_tokens == grp.n_tokens.sum()).all()

    # reference first-fit per shard
    for shard, grp in packed.sort_values("doc_id").groupby("shard"):
        seq, running, expected = 0, 0, []
        for t in grp.n_tokens:
            if running > 0 and running + t > 128:
                seq, running = seq + 1, 0
            expected.append(seq)
            running += t
        assert list(grp.seq_id) == expected, f"shard {shard}"


def test_pack_strict_matches_start_when_no_straddle(spark):
    """When every doc's tokens divide the budget evenly, start and strict
    policies agree exactly."""
    rows = [(i, "tok " * 63 + "tok") for i in range(40)]  # 64 tokens each
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = (
        pack_documents(docs, max_tokens=128, shards=2, boundary="start")
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        pack_documents(docs, max_tokens=128, shards=2, boundary="strict")
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert a.astype("int64").equals(b.astype("int64"))


def test_chunk_then_strict_pack_never_overflows(spark, docs):
    """The documented pipeline contract: chunk_documents bounds every
    doc at <= chunk budget, so strict packing into a larger sequence
    budget can never overflow — not even via oversized single docs."""
    from graphrole_spark.functions.corpus import chunk_documents

    chunks = chunk_documents(docs, max_tokens=64).select(
        F.concat_ws("#", "doc_id", "chunk_idx").alias("doc_id"),
        F.col("chunk_text").alias("text"),
    )
    packed = pack_documents(
        chunks, max_tokens=256, shards=4, boundary="strict"
    ).toPandas()
    assert (packed.n_tokens <= 64).all()
    assert (packed.groupby(["shard", "seq_id"]).seq_tokens.first() <= 256).all()
    assert len(packed) == chunks.count()


def test_mix_corpus_budgets_and_determinism(spark):
    from graphrole_spark.functions.corpus import mix_corpus

    rows = []
    for i in range(200):
        src = ["web", "code", "papers"][i % 3]
        rows.append((i, src, "tok " * (5 + i % 7)))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")

    weights = {"web": 0.6, "code": 0.4}          # papers absent -> dropped
    out = mix_corpus(docs, weights, total_tokens=400).toPandas()
    assert len(out) == 200                        # every doc decided

    kept = out[out["keep"] == 1]
    by_src = kept.groupby("source")["n_tokens"].sum()
    assert "papers" not in by_src.index           # zero budget
    # budget respected up to one boundary doc per source
    max_doc = out["n_tokens"].max()
    assert by_src.get("web", 0) <= 400 * 0.6 + max_doc
    assert by_src.get("code", 0) <= 400 * 0.4 + max_doc
    # budgets are actually used (maximal prefix, not trivially empty)
    assert by_src.get("web", 0) >= 400 * 0.6 - max_doc
    assert by_src.get("code", 0) >= 400 * 0.4 - max_doc

    # deterministic: identical keep set on a re-run with shuffled input
    out2 = (
        mix_corpus(docs.repartition(7), weights, total_tokens=400)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True), out2
    )


def test_mix_corpus_prefix_property(spark):
    """Kept docs per source are exactly the hash-order prefix whose
    PREVIOUS cumsum is under budget (boundary doc kept)."""
    import hashlib

    from graphrole_spark.functions.corpus import mix_corpus

    rows = [(i, "s", "w " * 10) for i in range(50)]   # 10 tokens each
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = mix_corpus(docs, {"s": 1.0}, total_tokens=95).toPandas()

    def u(doc_id):
        return int(hashlib.md5(f"{doc_id}mix1".encode()).hexdigest()[:8], 16)

    order = sorted(out["doc_id"], key=lambda d: (u(d), d))
    expect_keep = set(order[:10])                  # prev cumsum 90 < 95
    assert set(out.loc[out["keep"] == 1, "doc_id"]) == expect_keep


def test_assemble_corpus_end_to_end(spark):
    """The composed pipeline honors every stage's invariant on a corpus
    with planted junk, exact dups, near-dups, and oversized sources."""
    from graphrole_spark.functions.corpus import assemble_corpus

    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    rows = []
    for i in range(40):
        rows.append((i, "web", base + f" tail{i} " + base))
    rows.append((100, "web", rows[0][2]))                   # exact dup of 0
    rows.append((101, "web", base + " tail0x " + base))     # near dup of 0
    rows.append((102, "web", "x"))                          # fails min_tokens
    rows.append((103, "web", "1 2 3 4 5 6 7 8 9"))          # fails alpha ratio
    for i in range(200, 220):
        rows.append((i, "code", base + f" code{i} " + base))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")

    out = assemble_corpus(
        docs, {"web": 0.5, "code": 0.5}, total_tokens=400, max_seq_tokens=64,
    ).toPandas()

    ids = set(out["doc_id"])
    assert 102 not in ids and 103 not in ids          # quality gate
    assert 100 not in ids                             # exact dup dropped
    # near-dup cluster {0, 101}: exactly one survivor
    assert len(ids & {0, 101}) <= 1
    # packing invariant: multi-doc sequences within budget
    multi = out.groupby(["shard", "seq_id"]).filter(lambda g: len(g) > 1)
    if len(multi):
        assert (multi.groupby(["shard", "seq_id"])["seq_tokens"].first() <= 64).all()
    # mixing budget: kept tokens per source bounded (one-doc overshoot)
    by_src = (
        out.merge(docs.toPandas()[["doc_id", "source"]], on="doc_id")
        .groupby("source")["n_tokens"].sum()
    )
    max_doc = out["n_tokens"].max()
    for src in by_src.index:
        assert by_src[src] <= 400 * 0.5 + max_doc


def test_mix_corpus_custom_source_col(spark):
    """Regression: a non-default source_col crashed the window
    partitioning (it referenced the pre-rename name)."""
    from graphrole_spark.functions.corpus import mix_corpus

    docs = spark.createDataFrame(
        [(1, "a", "w " * 10), (2, "b", "w " * 10)],
        "doc_id long, origin string, text string",
    )
    out = mix_corpus(
        docs, {"a": 1.0}, total_tokens=100, source_col="origin"
    ).toPandas().set_index("doc_id")
    assert out.loc[1, "keep"] == 1 and out.loc[2, "keep"] == 0


def test_temperature_weights_alpha_extremes_and_order(spark):
    from graphrole_spark.functions.corpus import temperature_weights

    # web 10 docs x 10 tok = 100; code 5 x 10 = 50; papers 1 x 10 = 10
    rows = (
        [(i, "web", "w " * 10) for i in range(10)]
        + [(100 + i, "code", "w " * 10) for i in range(5)]
        + [(200, "papers", "w " * 10), (201, None, "w " * 10)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")

    w1 = temperature_weights(docs, alpha=1.0)
    assert set(w1) == {"web", "code", "papers"}  # NULL source excluded
    assert abs(sum(w1.values()) - 1.0) < 1e-12
    # alpha=1 reproduces the natural token shares
    assert abs(w1["web"] - 100 / 160) < 1e-12
    assert abs(w1["papers"] - 10 / 160) < 1e-12

    w0 = temperature_weights(docs, alpha=0.0)
    assert all(abs(v - 1 / 3) < 1e-12 for v in w0.values())

    # 0 < alpha < 1 upsamples the rare source, never past uniform,
    # and preserves the size order
    wh = temperature_weights(docs, alpha=0.5)
    assert w1["papers"] < wh["papers"] < 1 / 3
    assert wh["web"] > wh["code"] > wh["papers"]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        temperature_weights(docs, alpha=-0.1)


def test_temperature_mix_budgets_follow_smoothed_weights(spark):
    from graphrole_spark.functions.corpus import (
        temperature_mix,
        temperature_weights,
    )

    rows = (
        [(i, "web", "w " * 10) for i in range(40)]      # 400 tokens
        + [(100 + i, "code", "w " * 10) for i in range(4)]  # 40 tokens
    )
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    total = 200
    out = temperature_mix(docs, total_tokens=total, alpha=0.5).toPandas()
    w = temperature_weights(docs, alpha=0.5)
    kept = out[out["keep"] == 1].groupby("source")["n_tokens"].sum()
    max_doc = out["n_tokens"].max()
    for src, q in w.items():
        budget = total * q
        got = kept.get(src, 0)
        # within one boundary doc of the smoothed budget, capped by the
        # source's own size
        avail = out[out["source"] == src]["n_tokens"].sum()
        assert got <= min(budget + max_doc, avail)
        assert got >= min(budget - max_doc, avail) - 1e-9
    # code's kept share exceeds its natural 40/440 share (upsampled)
    assert kept["code"] / kept.sum() > 40 / 440


def test_corpus_stats_duckdb_parity(spark):
    import duckdb
    import numpy as np

    from graphrole_spark.functions.corpus import corpus_stats

    rows = [
        # src a: 5 docs, one NULL text, one empty, one exact dup pair
        (0, "a", "en", "x y z"),
        (1, "a", "en", "x y z"),
        (2, "a", "fr", None),
        (3, "a", "en", "   "),
        (4, "a", "de", "one two three four"),
        # src b: 3 docs, all distinct
        (5, "b", "en", "aa"),
        (6, "b", "en", "bb cc"),
        (7, "b", "fr", "dd ee ff gg hh"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, lang string, text string"
    )
    got = (
        corpus_stats(df).orderBy("source").toPandas().set_index("source")
    )
    assert got.loc["a", "n_docs"] == 5
    assert got.loc["a", "null_text"] == 1
    assert got.loc["a", "empty_text"] == 2  # NULL counts as empty too
    assert got.loc["a", "dup_docs"] == 1
    assert got.loc["a", "n_langs"] == 3
    assert got.loc["b", "dup_docs"] == 0
    assert got.loc["b", "total_tokens"] == 1 + 2 + 5

    con = duckdb.connect()
    import pandas as pd
    con.register(
        "d", pd.DataFrame(rows, columns=["doc_id", "source", "lang", "text"])
    )
    oracle = con.execute("""
        WITH t AS (
          SELECT source, lang, text,
                 CASE WHEN text IS NULL THEN 1 ELSE 0 END AS is_null,
                 CASE WHEN trim(coalesce(text,'')) = '' THEN 1 ELSE 0 END AS is_empty,
                 len(list_filter(string_split_regex(trim(coalesce(text,'')), ' +'),
                     x -> x <> '')) AS toks,
                 length(coalesce(text,'')) AS chars
          FROM d),
        prof AS (
          SELECT source, count(*) AS n_docs, sum(is_null) AS null_text,
                 sum(is_empty) AS empty_text, sum(toks) AS total_tokens,
                 round(avg(toks), 6) AS mean_tokens,
                 quantile_cont(toks, [0.25, 0.5, 0.75]) AS q,
                 max(toks) AS max_tokens,
                 round(avg(chars), 6) AS mean_chars,
                 count(DISTINCT lang) AS n_langs
          FROM t GROUP BY source),
        dup AS (
          SELECT source, sum(n) - count(*) AS dup_docs
          FROM (SELECT source, md5(coalesce(text,'')) AS h, count(*) AS n
                FROM d GROUP BY 1, 2)
          GROUP BY source)
        SELECT p.source, n_docs, null_text, empty_text, total_tokens,
               mean_tokens, q[1] AS q1_tokens, q[2] AS median_tokens,
               q[3] AS q3_tokens, max_tokens, mean_chars, n_langs,
               dup_docs, round(dup_docs * 1.0 / n_docs, 6) AS dup_frac
        FROM prof p JOIN dup USING (source) ORDER BY source
    """).df().set_index("source")
    for col in oracle.columns:
        g = got[col].astype(float).to_numpy()
        o = oracle[col].astype(float).to_numpy()
        assert np.allclose(g, o, rtol=0, atol=0), (col, g, o)


def test_upsample_corpus(spark):
    import duckdb
    import pandas as pd

    from graphrole_spark.functions.corpus import upsample_corpus

    rows = [(i, "a" if i % 2 == 0 else "b", f"doc {i}") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = upsample_corpus(df, {"a": 2.5, "b": 0.25}).select(
        "doc_id", "source", "epoch"
    )
    got = out.orderBy("doc_id", "epoch").toPandas()

    # every 'a' doc appears at least twice (full epochs), never 4+
    per = got[got.source == "a"].groupby("doc_id").size()
    assert per.min() == 2 and per.max() == 3 and len(per) == 200
    # 'b' is pure subsampling: 0 or 1 copies, strictly fewer than input
    perb = got[got.source == "b"].groupby("doc_id").size()
    assert perb.max() == 1 and 0 < len(perb) < 200

    con = duckdb.connect()
    con.register("d", pd.DataFrame(rows, columns=["doc_id", "source", "text"]))
    oracle = con.execute("""
        WITH dim AS (
          SELECT 'a' AS source, 2.5 AS e UNION ALL SELECT 'b', 0.25),
        j AS (
          SELECT doc_id, d.source, e, CAST(floor(e) AS INT) AS n_full,
                 e - floor(e) AS frac,
                 CAST(concat('0x', substr(md5(concat(d.source, '|',
                      CAST(doc_id AS VARCHAR), 'upsample')), 1, 8)) AS BIGINT)
                   / 4294967296.0 AS u
          FROM d JOIN dim USING (source)),
        x AS (
          SELECT doc_id, source, CAST(i AS INT) AS epoch, n_full, frac, u
          FROM j, unnest(generate_series(1, n_full + 1)) AS t(i))
        SELECT doc_id, source, epoch FROM x
        WHERE epoch <= n_full OR u < frac
        ORDER BY doc_id, epoch
    """).df()
    assert got["doc_id"].tolist() == oracle["doc_id"].tolist()
    assert got["epoch"].tolist() == oracle["epoch"].astype(int).tolist()
    assert got["source"].tolist() == oracle["source"].tolist()

    # integer budgets are exact; absent sources are dropped
    exact = upsample_corpus(df, {"a": 3}).groupBy().count().first()[0]
    assert exact == 600


def test_corpus_diff(spark):
    import duckdb
    import pandas as pd

    from graphrole_spark.functions.corpus import corpus_diff

    old_rows = [
        (0, "a", "alpha beta"),       # unchanged
        (1, "a", "gamma"),            # changed
        (2, "b", "delta epsilon"),    # removed
        (3, "b", None),               # NULL -> '' edit: unchanged
    ]
    new_rows = [
        (0, "a", "alpha beta"),
        (1, "a", "gamma gamma gamma"),
        (3, "b", ""),
        (4, "b", "zeta eta theta"),   # added
    ]
    schema = "doc_id long, source string, text string"
    out = (
        corpus_diff(
            spark.createDataFrame(old_rows, schema),
            spark.createDataFrame(new_rows, schema),
        )
        .orderBy("source", "status")
        .toPandas()
    )
    key = out.set_index(["source", "status"])
    assert key.loc[("a", "unchanged"), "n_docs"] == 1
    assert key.loc[("a", "changed"), "token_delta"] == 2  # 1 -> 3 tokens
    assert key.loc[("b", "removed"), "tokens_old"] == 2
    assert key.loc[("b", "added"), "tokens_new"] == 3
    assert key.loc[("b", "unchanged"), "n_docs"] == 1  # NULL -> ''

    con = duckdb.connect()
    con.register("o", pd.DataFrame(old_rows, columns=["doc_id", "source", "text"]))
    con.register("n", pd.DataFrame(new_rows, columns=["doc_id", "source", "text"]))
    oracle = con.execute("""
        WITH so AS (
          SELECT doc_id, source AS g_o, md5(coalesce(text,'')) AS h_o,
                 len(list_filter(string_split_regex(trim(coalesce(text,'')), ' +'),
                     x -> x <> '')) AS t_o
          FROM o),
        sn AS (
          SELECT doc_id, source AS g_n, md5(coalesce(text,'')) AS h_n,
                 len(list_filter(string_split_regex(trim(coalesce(text,'')), ' +'),
                     x -> x <> '')) AS t_n
          FROM n),
        j AS (SELECT * FROM so FULL OUTER JOIN sn USING (doc_id))
        SELECT coalesce(g_n, g_o) AS source,
               CASE WHEN h_o IS NULL THEN 'added'
                    WHEN h_n IS NULL THEN 'removed'
                    WHEN h_o = h_n THEN 'unchanged'
                    ELSE 'changed' END AS status,
               count(*) AS n_docs,
               sum(coalesce(t_o, 0)) AS tokens_old,
               sum(coalesce(t_n, 0)) AS tokens_new,
               sum(coalesce(t_n, 0)) - sum(coalesce(t_o, 0)) AS token_delta
        FROM j GROUP BY 1, 2 ORDER BY source, status
    """).df()
    got = out.reset_index(drop=True)
    for col in ["source", "status"]:
        assert got[col].tolist() == oracle[col].tolist()
    for col in ["n_docs", "tokens_old", "tokens_new", "token_delta"]:
        assert got[col].astype(int).tolist() == oracle[col].astype(int).tolist()


def test_curriculum_order(spark):
    import duckdb
    import pandas as pd

    from graphrole_spark.functions.corpus import curriculum_order

    rows = [(i, float((i * 37) % 100)) for i in range(300)]
    rows.append((300, None))  # unscored doc -> NULL phase
    df = spark.createDataFrame(rows, "doc_id long, loss double")
    got = (
        curriculum_order(df, "loss", phases=3, n_shards=4)
        .orderBy("doc_id")
        .toPandas()
    )
    scored = got[got.doc_id < 300]
    # phases balanced to within interpolation slack; easy-first:
    # max loss in phase 1 <= min loss in phase 3
    counts = scored.groupby("phase").size()
    assert set(counts.index) == {1, 2, 3}
    assert counts.max() - counts.min() <= 4
    assert scored[scored.phase == 1].loss.max() <= \
        scored[scored.phase == 3].loss.min()
    assert pd.isna(got[got.doc_id == 300].phase.iloc[0])
    # pos is a dense 0..k-1 permutation inside every (phase, shard)
    for (_, _), grp in scored.groupby(["phase", "shard"]):
        assert sorted(grp.pos.tolist()) == list(range(len(grp)))

    con = duckdb.connect()
    con.register("d", pd.DataFrame(rows, columns=["doc_id", "loss"]))
    oracle = con.execute("""
        WITH cuts AS (
          SELECT quantile_cont(loss, [1.0/3, 2.0/3]) AS cs FROM d),
        tiers AS (
          SELECT doc_id, loss,
                 CASE WHEN loss IS NULL THEN NULL
                      ELSE CAST(1 + len(list_filter(cs, c -> c < loss))
                           AS INT) END AS phase,
                 CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                      1, 8)) AS BIGINT) % 4 AS INT) AS shard,
                 CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR),
                      'curriculum')), 1, 8)) AS BIGINT) / 4294967296.0 AS u
          FROM d CROSS JOIN cuts)
        SELECT doc_id, loss, phase, shard,
               CAST(row_number() OVER (PARTITION BY phase, shard
                    ORDER BY u, doc_id) - 1 AS INT) AS pos
        FROM tiers ORDER BY doc_id
    """).df()
    assert got.doc_id.tolist() == oracle.doc_id.tolist()
    assert got.phase.astype("Int64").tolist() == \
        oracle.phase.astype("Int64").tolist()
    assert got.shard.astype(int).tolist() == oracle.shard.astype(int).tolist()
    assert got.pos.astype(int).tolist() == oracle.pos.astype(int).tolist()


def test_chunk_documents_stride_overlap(spark):
    """Sliding-window chunking: every token covered, consecutive chunks
    overlap by max_tokens - stride, last window reaches the end, and
    a python sliding-window oracle agrees exactly."""
    import random

    from graphrole_spark.functions.corpus import chunk_documents

    rng = random.Random(29)
    rows = []
    for i in range(40):
        n = rng.randint(0, 40)
        rows.append((f"d{i:02d}", " ".join(f"t{j}" for j in range(n))))
    df = spark.createDataFrame(rows, "doc_id string, text string")
    w, s = 8, 3
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_tokens"], r["chunk_text"])
        for r in chunk_documents(df, max_tokens=w, stride=s).collect()
    }
    n_rows = 0
    for did, text in rows:
        toks = text.split(" ") if text else [""]
        n = len(toks)
        nc = max(1, -(-(n - w) // s) + 1) if n > w else 1
        for ci in range(nc):
            sl = toks[ci * s: ci * s + w]
            assert got[(did, ci)] == (len(sl), " ".join(sl)), (did, ci)
            n_rows += 1
    assert len(got) == n_rows
    # default stride == max_tokens: disjoint chunks, original contract
    dis = chunk_documents(df, max_tokens=w)
    assert dis.where(F.col("chunk_tokens") > w).count() == 0
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(df, max_tokens=8, stride=9)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(df, max_tokens=8, stride=0)


def test_corpus_stats_approx_mode(spark):
    """approx=True (the beyond-memory scale path): identical schema,
    every non-quantile column exactly equal, quartiles within the
    sketch's rank-error bound of the exact ones (and exact here, since
    accuracy >> n)."""
    import random

    from graphrole_spark.functions.corpus import corpus_stats

    rng = random.Random(31)
    rows = [
        (f"s{i % 3}", f"d{i}", " ".join("w" for _ in range(rng.randint(0, 60))),
         rng.choice(["en", "de"]))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "source string, doc_id string, text string, lang string")
    exact = corpus_stats(df).orderBy("source").toPandas()
    apx = corpus_stats(df, approx=True).orderBy("source").toPandas()
    assert exact.columns.tolist() == apx.columns.tolist()
    assert [str(t) for t in exact.dtypes] == [str(t) for t in apx.dtypes]
    qcols = {"q1_tokens", "median_tokens", "q3_tokens"}
    for col in exact.columns:
        if col in qcols:
            # accuracy=10k on 100 rows/group: the sketch is exact up to
            # the lerp convention (approx reports an observed value)
            assert (abs(exact[col] - apx[col]) <= 1.0).all(), col
        else:
            assert exact[col].tolist() == apx[col].tolist(), col
