"""Semantic checks for text dedup/quality operators (beyond oracle parity)."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from xcube_stac_spark.operators import text as text_op

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def aug(spark):
    return entry_mod._aug_docs(spark, SF_DIR).cache()


def test_exact_dedup_finds_planted_copies(spark, aug):
    groups = text_op.exact_dedup(aug)
    n_pairs = groups.where(F.col("group_size") == 2).count()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    expected_pairs = len([i for i in range(n_docs) if i % 7 == 0])
    assert n_pairs == expected_pairs
    assert groups.where(F.col("group_size") > 2).count() == 0


def test_minhash_finds_planted_near_dups(spark, aug):
    pairs = text_op.minhash_near_dups(aug, threshold=0.5).collect()
    found = {(r.doc_a, r.doc_b) for r in pairs}
    # all exact copies (jaccard 1.0) must be found — banding guarantees
    # equal signatures collide
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    exact_expected = {(i, i + 200000) for i in range(0, n_docs, 7)}
    assert exact_expected <= found
    # most near-copies (first-5-tokens-dropped) should be found too
    near_expected = {(i, i + 100000) for i in range(0, n_docs, 5)}
    hit_rate = len(found & near_expected) / len(near_expected)
    assert hit_rate > 0.6, hit_rate
    # every reported pair really has jaccard >= 0.5
    assert all(r.jaccard >= 0.5 for r in pairs)


def test_simhash_near_includes_exact_copies(spark, aug):
    pairs = text_op.simhash_near_pairs(aug, max_hamming=12)
    zero = pairs.where(F.col("hamming") == 0)
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert zero.count() >= len(range(0, n_docs, 7))


def test_lang_quality_tokens_ranges(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    li = text_op.lang_id(docs)
    assert li.where(~F.col("lang_pred").isin("en", "de", "fr", "es", "und")).count() == 0
    q = text_op.quality_score(docs)
    bad = q.where((F.col("quality") < 0) | (F.col("quality") > 1)).count()
    assert bad == 0
    t = text_op.token_counts(docs)
    assert t.where(F.col("bpe_tokens") < F.col("ws_tokens")).count() == 0


def test_fingerprint_invariant_to_punct(spark):
    df = spark.createDataFrame(
        [(1, "Hello,   World! 42"), (2, "hello world 42"), (3, "different text")],
        "doc_id long, text string",
    )
    fps = {r.doc_id: r.fingerprint for r in text_op.fingerprint(df).collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]


def test_ngram_jaccard_hot_gram_bound_and_log(spark, caplog):
    """A shingle shared by many docs is dropped by the df bound (keeping the
    candidate join linear) and the drop is LOGGED, not silent."""
    import logging

    hot = "the quick brown fox jumps again"  # every doc shares these grams
    rows = [(i, f"{hot} unique{i} filler{i} tail{i} end{i}") for i in range(10)]
    # plus one true near-dup pair that shares RARE grams only
    rows += [
        (100, "alpha beta gamma delta epsilon zeta eta"),
        (101, "alpha beta gamma delta epsilon zeta theta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    with caplog.at_level(logging.WARNING, logger="xcube_stac_spark.operators.text"):
        bounded = text_op.ngram_jaccard_pairs(
            df, threshold=0.1, max_gram_freq=4, log_dropped=True
        ).collect()
    assert any("hot gram" in r.message for r in caplog.records)
    found = {(r.doc_a, r.doc_b) for r in bounded}
    # the rare-gram pair survives; no pair is formed through the hot grams
    assert (100, 101) in found
    assert all(a == 100 for a, b in found), found
    # unbounded variant DOES pair every hot-gram doc combination (10C2 + 1)
    unbounded = text_op.ngram_jaccard_pairs(df, threshold=0.1, max_gram_freq=None)
    assert unbounded.count() == 45 + 1


def test_ngram_jaccard_default_bound_is_set():
    import inspect

    sig = inspect.signature(text_op.ngram_jaccard_pairs)
    assert sig.parameters["max_gram_freq"].default == text_op.DEFAULT_MAX_GRAM_FREQ
    assert text_op.DEFAULT_MAX_GRAM_FREQ is not None


def test_ngram_oracle_parity_with_hot_grams(spark, tmp_path):
    """Spark query and DuckDB oracle must agree on a corpus where the
    default document-frequency bound actually FIRES (a 3-gram shared by
    more docs than DEFAULT_MAX_GRAM_FREQ) — the r01->r02 review found the
    oracle missing the bound, latent only because synthetic corpora had
    max df = 12."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry

    hot = "the quick brown fox says"
    n = text_op.DEFAULT_MAX_GRAM_FREQ + 16  # df(hot grams) > bound
    rows = [(i, f"{hot} unique{i} tail{i} again{i} end{i}") for i in range(n)]
    # one rare-gram near-dup pair that must survive
    rows += [(7001, "alpha beta gamma delta epsilon zeta eta"),
             (7002, "alpha beta gamma delta epsilon zeta theta")]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    pdf.to_parquet(tmp_path / "documents.parquet", index=False)

    sdf = entry._q_ngram_jaccard(spark, str(tmp_path)).toPandas()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    odf = con.sql(entry.oracle_sql()["ngram_jaccard"]).df()

    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns)
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    o = odf[cols].sort_values(cols).reset_index(drop=True).astype(s.dtypes.to_dict())
    pd.testing.assert_frame_equal(s, o, check_exact=True)
    # and the bound really fired: no pair exists purely through hot grams
    assert not any(a < 7000 and b < 7000 for a, b in zip(s.doc_a, s.doc_b))
    assert ((s.doc_a == 7001) & (s.doc_b == 7002)).any()


def test_pack_sequences_invariants_and_determinism(spark):
    """FFD sequence packing: every doc in exactly one sequence, token
    conservation under the least(tokens, L) truncation rule, capacity
    respected, the FFD fill guarantee (at most one under-half-full bin per
    shard), and BIT-deterministic output independent of the input's
    physical partitioning."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    L, shards = 128, 4
    packed = text_op.pack_sequences(docs, seq_len=L, shards=shards)
    rows = packed.collect()
    assert rows
    # capacity + self-consistency of each row
    for r in rows:
        assert r.n_tokens <= L, (r.seq_id, r.n_tokens)
        assert r.n_docs == len(r.doc_ids)
        assert abs(r.fill_ratio - round(r.n_tokens / L, 6)) < 1e-12
    # multiplicity: every packed doc appears exactly once
    all_ids = [d for r in rows for d in r.doc_ids]
    assert len(all_ids) == len(set(all_ids))
    # conservation vs the truncated per-doc budgets
    tc = {
        r.doc_id: min(r.bpe_tokens, L)
        for r in text_op.token_counts(docs).collect()
        if min(r.bpe_tokens, L) > 0
    }
    assert set(all_ids) == set(tc)
    assert sum(r.n_tokens for r in rows) == sum(tc.values())
    by_seq = {r.seq_id: r for r in rows}
    assert sum(tc[d] for d in by_seq[rows[0].seq_id].doc_ids) == rows[0].n_tokens
    # FFD guarantee: within a shard at most one bin is under half full
    from collections import Counter

    under_half = Counter()
    for r in rows:
        if r.n_tokens < L / 2:
            under_half[r.seq_id >> 40] += 1
    assert all(v <= 1 for v in under_half.values()), under_half
    # determinism: different physical partitioning, identical packing
    key = lambda rs: sorted((r.seq_id, tuple(r.doc_ids), r.n_tokens) for r in rs)
    repacked = text_op.pack_sequences(docs.repartition(13), seq_len=L, shards=shards)
    assert key(repacked.collect()) == key(rows)


def test_pack_sequences_truncates_oversized_docs(spark):
    """A doc longer than seq_len occupies exactly one full sequence."""
    big = "word " * 500
    docs = spark.createDataFrame(
        [(1, big), (2, "short doc"), (3, "another short doc")],
        "doc_id long, text string",
    )
    L = 64
    rows = text_op.pack_sequences(docs, seq_len=L, shards=2).collect()
    ids = {d: r for r in rows for d in r.doc_ids}
    assert ids[1].n_tokens == L and ids[1].doc_ids == [1]
    assert all(r.n_tokens <= L for r in rows)


def test_resolve_components_chain_and_singleton_pair(spark):
    """A 9-node chain (diameter 8) plus a disjoint pair: pointer jumping must
    converge well inside max_iter=5 (~log2 rounds), every node must label to
    the component min, and cluster sizes / canonical flags must be exact."""
    chain = [(i, i + 1) for i in range(10, 18)]  # 10-11-...-18
    pairs = spark.createDataFrame(
        chain + [(3, 7)], "doc_a long, doc_b long"
    )
    out = text_op.resolve_components(pairs, max_iter=5).collect()
    lab = {r.doc_id: r for r in out}
    assert set(lab) == set(range(10, 19)) | {3, 7}
    assert all(lab[n].canonical_id == 10 for n in range(10, 19))
    assert lab[3].canonical_id == 3 and lab[7].canonical_id == 3
    assert all(lab[n].cluster_size == 9 for n in range(10, 19))
    assert lab[3].cluster_size == 2
    assert [n for n in lab if lab[n].is_canonical] == sorted(
        {10, 3} & set(n for n in lab if lab[n].is_canonical) | {10, 3}
    )


def test_resolve_components_max_iter_warns(spark, caplog):
    """Hitting max_iter before the fixpoint logs a warning (no silent
    wrong answer at pathological diameters)."""
    import logging as _logging

    chain = [(i, i + 1) for i in range(0, 40)]
    pairs = spark.createDataFrame(chain, "doc_a long, doc_b long")
    with caplog.at_level(_logging.WARNING, logger="xcube_stac_spark.operators.text"):
        text_op.resolve_components(pairs, max_iter=1).collect()
    assert any("max_iter" in r.message for r in caplog.records)


def test_decontaminate_flags_planted_eval_and_copies(spark):
    """Docs containing a planted benchmark string are flagged, including an
    exact copy under a different id; clean docs are not; contam_frac is
    shared/doc-gram-count."""
    bench_str = "alpha beta gamma delta"
    docs = spark.createDataFrame(
        [
            (1, "x y " + bench_str + " z w"),
            (2, "totally unrelated words here none shared"),
            (3, "x y " + bench_str + " z w"),  # exact copy of 1
            (4, "alpha beta nothing else matches at all"),  # 2-gram only
        ],
        "doc_id long, text string",
    )
    evals = spark.createDataFrame([(900, bench_str)], "eval_id long, text string")
    rows = {r.doc_id: r for r in text_op.decontaminate(docs, evals, ngram=3).collect()}
    assert set(rows) == {1, 3}
    # doc 1 has 6 distinct 3-grams, shares both grams of the 4-token string
    assert rows[1].n_shared_grams == 2
    assert abs(rows[1].contam_frac - 2 / 6) < 1e-6
    assert rows[1].eval_id == 900


def test_stratified_sample_deterministic_rates_and_weights(spark):
    from xcube_stac_spark.operators import sampling as sampling_op

    df = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4 == 0).cast("string").alias("stratum"),
    )
    rates = {"true": 0.25, "false": 0.75}
    out = sampling_op.stratified_sample(df, "stratum", rates, "doc_id")
    got = out.groupBy("stratum").count().collect()
    by = {r.stratum: r['count'] for r in got}
    # binomial(1000, .25) / binomial(3000, .75): generous 5-sigma bounds
    assert 180 < by["true"] < 320 and 2130 < by["false"] < 2370, by
    w = {r.stratum: r.weight for r in out.select("stratum", "weight").distinct().collect()}
    assert w == {"true": 4.0, "false": round(1 / 0.75, 6)}
    # determinism under repartitioning (df.sample would NOT survive this)
    ids = lambda d: sorted(r.doc_id for r in d.select("doc_id").collect())
    assert ids(out) == ids(
        sampling_op.stratified_sample(df.repartition(17), "stratum", rates, "doc_id")
    )
    # default_rate=0 drops unmapped strata entirely
    none = sampling_op.stratified_sample(df, "stratum", {"true": 0.5}, "doc_id")
    assert none.where(F.col("stratum") == "false").count() == 0


def test_repetition_metrics_flags_looping_text(spark):
    """A degenerate looping doc scores high on every repetition axis; a
    all-distinct doc scores zero; a short doc (< n tokens) gets
    dup_ngram_frac 0 rather than null/divide-by-zero."""
    docs = spark.createDataFrame(
        [
            (1, "spam " * 19 + "spam"),          # 20x one word
            (2, "a b c d e f g h i j"),           # all distinct
            (3, "x y"),                            # too short for 3-grams
        ],
        "doc_id long, text string",
    )
    m = {r.doc_id: r for r in text_op.repetition_metrics(docs).collect()}
    assert m[1].dup_word_frac == 0.95 and m[1].top_word_frac == 1.0
    assert m[1].dup_ngram_frac == round(1 - 1 / 18, 6)
    assert m[2].dup_word_frac == 0.0 and m[2].top_word_frac == 0.1
    assert m[2].dup_ngram_frac == 0.0
    assert m[3].dup_ngram_frac == 0.0


def test_resolve_components_string_ids_long_chain(spark):
    """r7 regression (ADVICE r6): the convergence witness must be
    type-agnostic — a STRING-id chain of diameter > 2 (the documented
    image_near_dup rep_a/rep_b composition) must fully converge, not stop
    after one round as the old decimal-cast label-sum did with ANSI off."""
    chain = [(f"RGB{i:04d}", f"RGB{i + 1:04d}") for i in range(10, 18)]
    pairs = spark.createDataFrame(chain + [("zz9", "zz8")], "doc_a string, doc_b string")
    out = text_op.resolve_components(pairs, max_iter=8).collect()
    lab = {r.doc_id: r.canonical_id for r in out}
    assert all(lab[f"RGB{i:04d}"] == "RGB0010" for i in range(10, 19))
    assert lab["zz8"] == "zz8" and lab["zz9"] == "zz8"


def test_pack_ffd_segment_tree_matches_linear_scan():
    """The r7 capacity-indexed first-fit must place every doc in exactly
    the bin the linear first-fit scan chose — identical bins, identical
    order — including an adversarial ~seq_len/2 distribution."""
    import random

    def linear_ffd(items, seq_len):
        bins = []
        for doc_id, tok in items:
            for b in bins:
                if b[0] + tok <= seq_len:
                    b[0] += tok
                    b[1].append(doc_id)
                    break
            else:
                bins.append([tok, [doc_id]])
        return bins

    def tree_ffd(items, seq_len):
        size = 1
        while size < max(len(items), 1):
            size <<= 1
        tree = [-1] * (2 * size)
        bins = []
        for doc_id, tok in items:
            if tree[1] >= tok:
                node = 1
                while node < size:
                    node = 2 * node if tree[2 * node] >= tok else 2 * node + 1
                bi = node - size
                bins[bi][0] += tok
                bins[bi][1].append(doc_id)
                rem = seq_len - bins[bi][0]
            else:
                bi = len(bins)
                bins.append([tok, [doc_id]])
                node = size + bi
                rem = seq_len - tok
            tree[node] = rem
            node >>= 1
            while node:
                tree[node] = max(tree[2 * node], tree[2 * node + 1])
                node >>= 1
        return bins

    rng = random.Random(7)
    cases = [
        [(i, rng.randint(1, 512)) for i in range(2000)],
        [(i, rng.randint(200, 300)) for i in range(2000)],  # ~seq_len/2 adversary
        [(i, 512) for i in range(50)],
        [(0, 1)],
        [],
    ]
    for items in cases:
        items = sorted(items, key=lambda it: (-it[1], it[0]))
        assert tree_ffd(items, 512) == linear_ffd(items, 512)


def test_pack_sequences_adversarial_half_len_shard(spark):
    """pack_sequences end-to-end with an adversarial ~seq_len/2 token
    distribution (every bin takes exactly one doc until a small one fits):
    invariants hold and the run completes fast (the O(n·bins) scan this
    replaced was quadratic here)."""
    docs = spark.range(3000).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.array_repeat(F.lit("w"), (F.col("id") % 3 + 130).cast("int"))).alias("text"),
    )
    packed = text_op.pack_sequences(docs, seq_len=256, shards=4).collect()
    seen = sorted(d for r in packed for d in r.doc_ids)
    assert seen == list(range(3000))
    assert all(r.n_tokens <= 256 for r in packed)
