"""Similarity search (exact + LSH) and transcript-generator tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from stream_lib_spark.similarity import brute_force_topk, lsh_bucketed_topk
from stream_lib_spark.transcripts import generate_transcripts, turn_latencies

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def _numpy_topk(pdf, query_ids, k):
    ids = pdf["vec_id"].to_numpy()
    m = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    out = {}
    for qid in query_ids:
        q = m[ids == qid][0]
        sims = m @ q
        sims[ids == qid] = -np.inf
        order = np.lexsort((ids, -sims))
        out[qid] = [int(ids[i]) for i in order[:k]]
    return out


def test_brute_force_matches_numpy(spark, emb):
    pdf = emb.toPandas()
    qids = [0, 1, 2]
    queries = [(int(r["vec_id"]), list(r["embedding"])) for _, r in pdf.iterrows() if r["vec_id"] in qids]
    got = brute_force_topk(emb.repartition(4), queries, k=5).collect()
    expected = _numpy_topk(pdf, qids, 5)
    for qid in qids:
        mine = [r["neighbor_id"] for r in got if r["query_id"] == qid]
        assert mine == expected[qid]


def test_brute_force_df_matches_list_variant(spark, emb):
    """The DataFrame entry point (explicit sc.broadcast) must return
    row-for-row what the driver-list variant returns."""
    from stream_lib_spark.similarity import brute_force_topk_df

    pdf = emb.toPandas()
    qids = [0, 1, 2]
    queries = [(int(r["vec_id"]), list(r["embedding"]))
               for _, r in pdf.iterrows() if r["vec_id"] in qids]
    want = [tuple(r) for r in brute_force_topk(emb.repartition(4), queries, k=5).collect()]
    got = [tuple(r) for r in brute_force_topk_df(
        emb.repartition(4), emb.where(F.col("vec_id") < 3), k=5).collect()]
    assert got == want


def test_brute_force_df_rejects_oversized_query_side(spark, emb):
    from stream_lib_spark.similarity import brute_force_topk_df

    with pytest.raises(ValueError, match="max_broadcast_queries"):
        brute_force_topk_df(emb, emb, k=3, max_broadcast_queries=10)


def test_lsh_recall_reasonable(spark, emb):
    pdf = emb.toPandas()
    qids = list(range(10))
    queries = emb.where(F.col("vec_id") < 10)
    # the driver's synthetic embeddings are unclustered (top-5 cosine
    # ~0.32), so probe densely: p_agree=1-acos(.32)/pi=.60 per plane,
    # band hit .6**4=.13, 12 bands -> expected recall ~1-(1-.13)**12=.81
    got = lsh_bucketed_topk(emb, queries, dim=64, k=5, n_planes=4, n_bands=12).collect()
    exact = _numpy_topk(pdf, qids, 5)
    hits = total = 0
    for qid in qids:
        mine = {r["neighbor_id"] for r in got if r["query_id"] == qid}
        total += 5
        hits += len(mine & set(exact[qid]))
    assert hits / total >= 0.5  # well under the ~0.81 expectation, above chance
    # every returned similarity must still be exact cosine (verify one)
    assert all(-1.0001 <= r["cosine"] <= 1.0001 for r in got)


def test_transcripts_shape_and_invariants(spark):
    t = generate_transcripts(spark, n_convs=200, partitions=4).cache()
    assert t.schema.simpleString() == (
        "struct<conv_id:string,turn_idx:int,role:string,text:string,tool:string,ts:timestamp>"
    )
    # contiguous turn_idx per conversation starting at 0
    agg = t.groupBy("conv_id").agg(
        F.min("turn_idx").alias("lo"), F.max("turn_idx").alias("hi"), F.count("*").alias("n")
    )
    bad = agg.where((F.col("lo") != 0) | (F.col("n") != F.col("hi") + 1)).count()
    assert bad == 0
    # ts strictly increasing within a conversation (stable turn ordering)
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    mono = t.withColumn("prev", F.lag("ts").over(w)).where(
        F.col("prev").isNotNull() & (F.col("ts") <= F.col("prev"))
    )
    assert mono.count() == 0
    # tool only on tool turns; hot conv skew exists
    assert t.where((F.col("role") != "tool") & F.col("tool").isNotNull()).count() == 0
    sizes = dict(t.groupBy("conv_id").count().collect())
    assert sizes["conv-0"] == 2000 and sizes["conv-0"] > 10 * np.median(list(sizes.values()))


def test_transcripts_deterministic_across_partitioning(spark):
    a = generate_transcripts(spark, n_convs=100, partitions=2)
    b = generate_transcripts(spark, n_convs=100, partitions=7)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_turn_latencies_positive(spark):
    t = generate_transcripts(spark, n_convs=50, partitions=2)
    lat = turn_latencies(t)
    assert lat.where(F.col("latency_s") <= 0).count() == 0
    assert lat.count() == t.count() - 50  # one lost row per conversation (lag)


def test_embedding_near_dup_pairs_finds_planted(spark, emb):
    import numpy as np

    from stream_lib_spark.similarity import embedding_near_dup_pairs

    pdf = emb.limit(4).toPandas()
    rows = []
    for i, r in pdf.iterrows():
        v = np.array(r["embedding"], dtype=float)
        rows.append((int(1000 + i), v.tolist()))
        noise = np.random.RandomState(i).normal(0, 0.01 * np.abs(v).mean(), len(v))
        rows.append((int(2000 + i), (v + noise).tolist()))
    planted = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    found = {(r["id_a"], r["id_b"]) for r in embedding_near_dup_pairs(planted, dim=64, threshold=0.95).collect()}
    assert all((1000 + i, 2000 + i) in found for i in range(4))


def test_ivf_topk_recall_and_determinism(spark, emb):
    from stream_lib_spark.similarity import ivf_topk

    pdf = emb.toPandas()
    qids = list(range(8))
    queries = emb.where(F.col("vec_id") < 8)
    got = ivf_topk(emb, queries, k=5, n_lists=16, n_probe=12).collect()
    exact = _numpy_topk(pdf, qids, 5)
    hits = sum(
        len({r["neighbor_id"] for r in got if r["query_id"] == q} & set(exact[q]))
        for q in qids
    )
    # n_probe=12/16 on unclustered vectors: each true neighbor is scored
    # iff its list is probed (~75% mass) — well above chance, below 1.0
    assert hits / (5 * len(qids)) >= 0.5
    # deterministic: same centroids (bottom-k hash sample) on a rerun
    again = ivf_topk(emb, queries, k=5, n_lists=16, n_probe=12).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in again]
    # full probe == exact brute force
    full = ivf_topk(emb, queries, k=5, n_lists=8, n_probe=8).collect()
    for q in qids:
        assert [r["neighbor_id"] for r in full if r["query_id"] == q] == exact[q]


def test_ivf_candidate_count_matches_join(spark, emb):
    """The deterministic IVF work counter equals the row count of the
    actual probe join (pre self-pair filter): same centroids, same
    assignment, same probe selection."""
    from pyspark.sql import functions as F

    from stream_lib_spark.similarity import (
        ivf_assign,
        ivf_candidate_count,
        ivf_centroids,
        ivf_probe_lists,
    )

    queries = emb.where(F.col("vec_id") < 10)
    n = ivf_candidate_count(emb, queries, n_lists=8, n_probe=3)
    cents = ivf_centroids(emb, 8)
    bucketed = ivf_assign(emb, cents).select(
        F.col("vec_id").alias("neighbor_id"), "list_id")
    probed = ivf_probe_lists(queries.select("vec_id", "embedding"), cents, 3).select(
        F.col("vec_id").alias("query_id"), F.explode("probe_lists").alias("list_id"))
    joined = bucketed.join(probed, "list_id").count()
    assert n == joined
    assert n > 0


def _clustered_corpus(spark, n_clusters=8, per=150, dim=16, sigma=0.25, seed=7):
    """Deterministic planted-Gaussian-cluster embeddings (RandomState is
    frozen by numpy's compatibility guarantee): well-separated centers,
    tight clusters — the shape real embedding corpora have and the
    bottom-k random quantizer is weakest on."""
    rs = np.random.RandomState(seed)
    centers = rs.normal(size=(n_clusters, dim)) * 5.0
    pts = np.concatenate([
        centers[c] + rs.normal(size=(per, dim)) * sigma for c in range(n_clusters)
    ])
    rows = [(int(i), [float(x) for x in pts[i]]) for i in range(len(pts))]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _recall(spark, approx, truth):
    t = {}
    for r in truth.collect():
        t.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    a = {}
    for r in approx.collect():
        a.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(t[q] & a.get(q, set())) for q in t)
    return hits / sum(len(v) for v in t.values())


def test_ivf_refined_recall_on_clustered_corpus(spark):
    """On a clustered corpus at n_probe << n_lists, k-means-refined
    lists must reach high recall (>= 0.9) and at least match the
    random-sample quantizer; refined centroids are byte-deterministic
    under repartitioning (fixed-point int64 partial sums)."""
    from stream_lib_spark.similarity import (
        brute_force_topk,
        ivf_centroids_refined,
        ivf_topk,
    )

    corpus = _clustered_corpus(spark)
    q_rows = corpus.where(F.col("vec_id") % 150 < 4).collect()  # 4 per cluster
    queries = spark.createDataFrame(q_rows, corpus.schema)
    truth = brute_force_topk(corpus, [(r["vec_id"], list(r["embedding"])) for r in q_rows], k=5)

    refined = ivf_topk(corpus, queries, k=5, n_lists=16, n_probe=2,
                       refine_iters=2, dim=16)
    random_q = ivf_topk(corpus, queries, k=5, n_lists=16, n_probe=2)
    r_refined = _recall(spark, refined, truth)
    r_random = _recall(spark, random_q, truth)
    assert r_refined >= 0.9, (r_refined, r_random)
    # refined must be in random's league (both can top 0.95 on this
    # fixture; tiny orderings flip which one edges ahead) — the hard
    # claim is the absolute recall bar above, not a strict ordering
    assert r_refined >= r_random - 0.03, (r_refined, r_random)

    c1 = ivf_centroids_refined(corpus.repartition(3), 16, 16, refine_iters=2)
    c2 = ivf_centroids_refined(corpus.repartition(11), 16, 16, refine_iters=2)
    assert c1.tobytes() == c2.tobytes()


def test_auto_n_lists_scale_rule():
    from stream_lib_spark.similarity import auto_n_lists

    assert auto_n_lists(0) == 16 and auto_n_lists(400) == 20
    assert auto_n_lists(1_000_000) == 1000
    assert auto_n_lists(10**10) == 65536  # cap: centroid broadcast bound
    assert auto_n_lists(10**10, max_lists=4096) == 4096
    # monotone non-decreasing across decades (no layout regression as
    # the corpus grows)
    vals = [auto_n_lists(10**d) for d in range(2, 11)]
    assert vals == sorted(vals)


def test_ivf_topk_auto_layout_matches_explicit(spark):
    """n_lists=None must behave exactly like passing auto_n_lists(N):
    same deterministic centroids, same results."""
    from stream_lib_spark.similarity import auto_n_lists, ivf_topk

    import numpy as np

    rs = np.random.RandomState(3)
    rows = [(int(i), [float(x) for x in rs.normal(size=8)]) for i in range(300)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(rows[:4], corpus.schema)
    nl = auto_n_lists(300)
    assert nl == 17
    got_auto = ivf_topk(corpus, queries, k=3, n_probe=17).collect()
    got_expl = ivf_topk(corpus, queries, k=3, n_lists=nl, n_probe=17).collect()
    assert sorted(map(tuple, got_auto)) == sorted(map(tuple, got_expl))


def test_auto_lsh_planes_tracks_log2():
    from stream_lib_spark.similarity import auto_lsh_planes

    assert auto_lsh_planes(100) == 8          # clamped floor
    assert auto_lsh_planes(50_000) == 16      # round(log2 50000)=16
    assert auto_lsh_planes(10**9) == 28       # clamped ceiling
    vals = [auto_lsh_planes(10**d) for d in range(2, 11)]
    assert vals == sorted(vals)


def test_auto_lsh_bands_recall_formula():
    import math

    from stream_lib_spark.similarity import auto_lsh_bands

    # bands must grow when planes grow (to hold recall) and when the
    # threshold drops (weaker per-plane agreement)
    assert auto_lsh_bands(0.9, 16) > auto_lsh_bands(0.9, 8)
    assert auto_lsh_bands(0.7, 12) > auto_lsh_bands(0.9, 12)
    # and deliver the documented OR-construction recall at s_detect
    for t, planes in [(0.9, 12), (0.7, 10)]:
        b = auto_lsh_bands(t, planes, target_recall=0.98)
        p = 1 - math.acos((1 + t) / 2) / math.pi
        assert 1 - (1 - p ** planes) ** b >= 0.98


def test_auto_lsh_bands_clamp_is_loud_and_validates_recall():
    import warnings

    import pytest

    from stream_lib_spark.similarity import auto_lsh_bands

    # max_bands is a cost ceiling, not a silent recall downgrade: when
    # the formula needs more bands than allowed, a warning must state
    # the recall actually achieved (no-silent-caps rule)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert auto_lsh_bands(0.7, 26, target_recall=0.98, max_bands=512) == 512
        assert len(w) == 1 and "achieved recall" in str(w[0].message)
    # in-budget derivations stay silent
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        auto_lsh_bands(0.9, 12, target_recall=0.98)
        assert not w
    # the band formula diverges at recall 1.0 — clear error, not a
    # ZeroDivisionError from inside the log
    for bad in (1.0, 0.0, -0.5, 1.5):
        with pytest.raises(ValueError, match="target_recall"):
            auto_lsh_bands(0.9, 12, target_recall=bad)


def test_embedding_candidate_count_matches_join(spark):
    """The work counter must equal the banded join's pre-dedup pair
    count exactly (same signatures, same params)."""
    import numpy as np

    from pyspark.sql import functions as F

    from stream_lib_spark.similarity import (
        embedding_candidate_count,
        hyperplane_signature,
    )

    rs = np.random.RandomState(7)
    rows = [(int(i), [float(x) for x in rs.normal(size=8)]) for i in range(200)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    counted = embedding_candidate_count(corpus, dim=8, n_planes=4, n_bands=3)
    banded = hyperplane_signature(corpus, 8, 4, 11, "embedding", 3).select(
        "vec_id", F.posexplode("lsh_sigs").alias("band", "sig"))
    a = banded.select(F.col("vec_id").alias("id_a"), "band", "sig")
    b = banded.select(F.col("vec_id").alias("id_b"), "band", "sig")
    joined = a.join(b, ["band", "sig"]).where(F.col("id_a") < F.col("id_b")).count()
    assert counted == joined > 0


def test_embedding_near_dup_auto_matches_explicit(spark, emb):
    """Auto (planes, bands) must behave exactly like passing the derived
    values explicitly — same seeded hyperplanes, same pairs."""
    from stream_lib_spark.similarity import (
        auto_lsh_bands,
        auto_lsh_planes,
        embedding_near_dup_pairs,
    )

    corpus = emb.limit(300)
    n = corpus.count()
    pl, bd = auto_lsh_planes(n), auto_lsh_bands(0.9, auto_lsh_planes(n))
    got_auto = embedding_near_dup_pairs(corpus, dim=64, threshold=0.9).collect()
    got_expl = embedding_near_dup_pairs(
        corpus, dim=64, threshold=0.9, n_planes=pl, n_bands=bd).collect()
    assert sorted(map(tuple, got_auto)) == sorted(map(tuple, got_expl))
