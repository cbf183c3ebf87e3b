"""Property-based tests (hypothesis) for the merge/watermark core —
the invariants that must hold for ANY input, not just the replayed
reference narratives."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from hive_exporter_spark.operators import core

BASE_TS = datetime(2024, 1, 1)

# (id, version, value): version becomes last_modified = BASE_TS + version
# days; (id, version) pairs are deduplicated so latest-wins is well-defined.
rows_strategy = st.lists(
    st.tuples(st.integers(0, 8), st.integers(0, 8), st.integers(0, 100)),
    min_size=1, max_size=12, unique_by=lambda r: (r[0], r[1]),
)

SETTINGS = settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _df(spark, rows):
    data = [(i, BASE_TS + timedelta(days=v), x) for i, v, x in rows]
    return spark.createDataFrame(data, "id int, last_modified timestamp, value int")


@given(base=rows_strategy, inc=rows_strategy)
@SETTINGS
def test_merge_key_unique_and_latest_wins(spark, base, inc):
    merged = core.merge_upsert(_df(spark, base), _df(spark, inc), ["id"],
                               "last_modified", tiebreakers=["value"])
    out = merged.collect()
    ids = [r["id"] for r in out]
    assert len(ids) == len(set(ids)), "merge must leave one row per key"
    # the surviving version per key carries the max last_modified seen
    want = {}
    for i, v, x in base + inc:
        if i not in want or v > want[i]:
            want[i] = v
    got = {r["id"]: (r["last_modified"] - BASE_TS).days for r in out}
    assert {k: v for k, v in got.items()} == want


@given(rows=rows_strategy)
@SETTINGS
def test_merge_idempotent(spark, rows):
    df = _df(spark, rows)
    once = core.latest_per_key(df, ["id"], "last_modified", ["value"])
    twice = core.latest_per_key(once, ["id"], "last_modified", ["value"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


@given(rows=rows_strategy, wm=st.integers(-1, 9))
@SETTINGS
def test_newer_than_partitions_input(spark, rows, wm):
    """strict-> filter: kept ∪ dropped == input; kept are all > wm."""
    df = _df(spark, rows).withColumn("seq", F.col("value"))
    kept = core.newer_than(df, "seq", wm).collect()
    assert all(r["seq"] > wm for r in kept)
    n_dropped = len([r for r in rows if r[2] <= wm])
    assert len(kept) + n_dropped == len(rows)


# --- r3 additions: distributed rank / sharding / tail trim ---------------

from hive_exporter_spark.operators import pipeline  # noqa: E402

rank_rows = st.lists(
    st.tuples(st.integers(0, 50), st.integers(0, 10**6)),
    min_size=1, max_size=40, unique_by=lambda r: r[1],
)


@given(rows=rank_rows)
@SETTINGS
def test_global_rank_matches_python_sort(spark, rows):
    df = spark.createDataFrame(rows, "v long, id long").repartition(5)
    got = {
        r["id"]: r["rank"]
        for r in pipeline.global_rank(df, [F.col("v"), F.col("id")]).collect()
    }
    want = {
        id_: i + 1
        for i, (v, id_) in enumerate(sorted(rows, key=lambda r: (r[0], r[1])))
    }
    assert got == want


@given(rows=rank_rows, n_shards=st.integers(2, 8))
@SETTINGS
def test_shard_by_tokens_is_partition(spark, rows, n_shards):
    docs = spark.createDataFrame(
        [(id_, "w " * max(v, 1)) for v, id_ in rows], "doc_id long, text string"
    )
    out = pipeline.shard_by_tokens(docs, n_shards=n_shards).collect()
    # Every doc exactly once; shard ids in range.
    assert sorted(r["doc_id"] for r in out) == sorted(id_ for _, id_ in rows)
    assert all(0 <= r["shard"] < n_shards for r in out)


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 1000)),
        min_size=4, max_size=40,
    )
)
@SETTINGS
def test_trim_outliers_subset_and_tail_drop(spark, rows):
    df = spark.createDataFrame(
        [(g, float(v)) for g, v in rows], "event_type string, value double"
    )
    kept = pipeline.trim_outliers(df, lo=0.25, hi=0.75).collect()
    # Subset of the input multiset.
    from collections import Counter
    assert not Counter((r["event_type"], r["value"]) for r in kept) - Counter(
        (g, float(v)) for g, v in rows
    )
    # A UNIQUE per-group max has percent_rank exactly 1.0 > 0.75 when
    # the group has >1 distinct value → must be dropped. (A TIED max
    # ranks at (first_rank-1)/(n-1) < 1.0 and may legitimately
    # survive: [0,0,1,1] puts the 1s at 2/3 ≤ 0.75 — hypothesis found
    # exactly this case.)
    for g in {g for g, _ in rows}:
        vals = [v for gg, v in rows if gg == g]
        if len(set(vals)) > 1 and vals.count(max(vals)) == 1:
            assert (g, float(max(vals))) not in {
                (r["event_type"], r["value"]) for r in kept
            }


@given(rows=st.lists(
    st.tuples(st.integers(0, 30), st.sampled_from(["a", "b"]),
              st.booleans()),
    min_size=2, max_size=40))
@SETTINGS
def test_ams_linearity_any_split(spark, rows):
    """sketch(A ∪ B) == sketch(A) + sketch(B) element-wise for ANY
    split of the rows, and the exact F2 anchor equals the Python
    computation."""
    from collections import Counter

    from hive_exporter_spark.operators import sketches as sk

    df = spark.createDataFrame(
        [(k, g) for k, g, _ in rows], "k long, grp string")
    half_a = spark.createDataFrame(
        [(k, g) for k, g, side in rows if side] or [(999999, "zz")],
        "k long, grp string")
    half_b = spark.createDataFrame(
        [(k, g) for k, g, side in rows if not side] or [(999999, "zz")],
        "k long, grp string")
    whole = sk.ams_sums(df, "k", ["grp"], r=8)
    merged = (sk.ams_sums(half_a, "k", ["grp"], r=8)
              .unionByName(sk.ams_sums(half_b, "k", ["grp"], r=8))
              .groupBy("grp", "i").agg(F.sum("xi").alias("xi")))
    w = {(r["grp"], r["i"]): r["xi"] for r in whole.collect()}
    m = {(r["grp"], r["i"]): r["xi"] for r in merged.collect()
         if r["grp"] != "zz" or ("zz", r["i"]) in w}
    # merged minus filler must equal whole exactly
    assert {k: v for k, v in m.items() if k[0] != "zz"} == w or \
        m == w
    counts = Counter((k, g) for k, g, _ in rows)
    f2 = {}
    for (k, g), c in counts.items():
        f2[g] = f2.get(g, 0) + c * c
    got = {r["grp"]: r["f2_selfjoin_rows"]
           for r in sk.ams_f2(df, "k", ["grp"], r=8).collect()}
    assert got == f2


@given(words=st.lists(
    st.text(alphabet="abcd", min_size=1, max_size=6),
    min_size=1, max_size=15))
@SETTINGS
def test_bpe_train_replay_any_corpus(spark, words):
    """The distributed trainer equals the sequential reference
    algorithm on ANY random word multiset (3 merges)."""
    from collections import Counter

    import tests.test_llm_ops as tl
    from hive_exporter_spark.operators import llm

    text = " ".join(words)
    df = spark.createDataFrame(
        [(0, text, "en", "t", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long")
    got = [(r["rank"], r["left"], r["right"], r["pair_count"])
           for r in llm.bpe_train(df, 3).orderBy("rank").collect()]
    assert got == tl._bpe_replay(Counter(words), 3)


# --- webclean.strip_boilerplate: sequential-reference + idempotence ----

words_strategy = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=14)


def _ref_strip(words, seg_words=2):
    """Sequential reference: chop into seg_words-word windows, keep
    each segment's first occurrence, rejoin."""
    segs = [" ".join(words[i:i + seg_words])
            for i in range(0, len(words), seg_words)]
    seen, kept = set(), []
    for s in segs:
        if s not in seen:
            seen.add(s)
            kept.append(s)
    return segs, kept


@given(docs=st.lists(words_strategy, min_size=1, max_size=5))
@SETTINGS
def test_strip_boilerplate_matches_sequential_reference(spark, docs):
    from hive_exporter_spark.operators import webclean

    df = spark.createDataFrame(
        [(i, " ".join(w)) for i, w in enumerate(docs)],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in webclean.strip_boilerplate(df).collect()}
    for i, w in enumerate(docs):
        segs, kept = _ref_strip(w)
        r = out[i]
        assert r["n_segs"] == len(segs)
        assert r["n_kept"] == len(kept)
        assert r["clean_text"] == " ".join(kept)
        assert r["was_changed"] == (len(kept) < len(segs))
        # idempotence on the already-clean text (re-chunking a clean
        # doc can produce NEW windows across old segment boundaries,
        # so assert the sequential model, not naive string equality)
        segs2, kept2 = _ref_strip(" ".join(kept).split(" "))
        assert len(kept2) <= len(segs2)


# (id, bucket) memberships for the shared hot-bucket armor; ids unique
# within a bucket (a doc appears in a bucket at most once, as in every
# banded screen).
bucket_rows = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 3)),
    min_size=1, max_size=24, unique_by=lambda r: (r[0], r[1]),
)


@given(rows=bucket_rows, cap=st.integers(2, 6))
@SETTINGS
def test_capped_bucket_pairs_invariants(spark, rows, cap):
    """The armor five screens share (MinHash/SimHash/embedding-LSH/
    pHash bands, fuzzy blocks), for ANY membership table and cap:
    (1) every emitted pair co-occurs in some bucket (subset of the
    uncapped candidates); (2) per-bucket output is bounded by
    all-pairs below the cap and by the linear chain above it;
    (3) within every bucket the emitted pairs keep its members in ONE
    connected component; (4) ordering: doc_a < doc_b, no dups."""
    from collections import defaultdict

    from hive_exporter_spark.operators.llm import capped_bucket_pairs

    df = spark.createDataFrame(rows, "doc_id long, bucket int")
    got = {(r["doc_a"], r["doc_b"])
           for r in capped_bucket_pairs(df, ["bucket"], "doc_id",
                                        cap).collect()}
    members = defaultdict(set)
    for i, b in rows:
        members[b].add(i)
    allowed = {(a, b) for m in members.values()
               for a in m for b in m if a < b}
    assert got <= allowed                                  # (1)
    assert all(a < b for a, b in got)                      # (4)

    total_bound = 0
    for m in members.values():
        n = len(m)
        total_bound += n * (n - 1) // 2 if n <= cap else n - 1
    assert len(got) <= total_bound                         # (2)

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in got:
        parent[find(a)] = find(b)
    for m in members.values():
        if len(m) > 1:
            roots = {find(i) for i in m}
            assert len(roots) == 1, (m, got)               # (3)


# ---------------------------------------------------------------------------
# Partitioned vs flat near-dup streaming state (r10)
# ---------------------------------------------------------------------------

# Docs built from a tiny token pool so near-duplicates (and exact
# duplicates, and too-short-to-shingle docs) all occur organically.
_doc_strategy = st.lists(
    st.tuples(
        st.integers(0, 10_000),                       # doc_id
        st.lists(st.sampled_from(
            ["alpha", "beta", "gamma", "delta", "eps"]),
            min_size=0, max_size=8),                  # tokens
    ),
    min_size=1, max_size=10, unique_by=lambda r: r[0],
)


@given(b1=_doc_strategy, b2=_doc_strategy)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_partitioned_state_layout_decision_identical(spark, tmp_path_factory,
                                                     b1, b2):
    """For ANY two-micro-batch document sequence — including exact
    dups, near-dups, cross-batch twins, and signature-less short docs
    — the partitioned state layout admits EXACTLY the set the flat
    layout admits (r10 invariant behind the state re-layout)."""
    from hive_exporter_spark.streaming.state import init_state_root
    from hive_exporter_spark.streaming.streams import near_dedup_state_step

    # disjoint id spaces per batch (a real stream never re-sends an id
    # within a run; cross-batch text twins still occur via the pool)
    rows1 = [(i, " ".join(toks)) for i, toks in b1]
    rows2 = [(i + 20_000, " ".join(toks)) for i, toks in b2]
    schema = "doc_id long, text string"
    base = tmp_path_factory.mktemp("layout_prop")
    flat_root = str(base / "flat")
    part_root = str(base / "part")
    init_state_root(part_root)
    got = {}
    for layout, root in (("flat", flat_root), ("partitioned", part_root)):
        bloom_state: dict = {}
        admitted_ids = []
        for rows in (rows1, rows2):
            adm, _ = near_dedup_state_step(
                spark.createDataFrame(rows, schema), root, None,
                layout=layout, bloom_state=bloom_state)
            admitted_ids.append({r["doc_id"] for r in adm.collect()})
        got[layout] = admitted_ids
    # Drop this example's localCheckpoint refs promptly so the
    # ContextCleaner can free the JVM blocks between examples (the
    # session JVM is shared by the whole suite).
    import gc

    gc.collect()
    assert got["flat"] == got["partitioned"]
