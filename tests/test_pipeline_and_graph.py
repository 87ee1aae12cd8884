"""Property checks for the pipeline/graph batch (SURVEY.md §5.3):
PageRank vs an independent Python reference, LSH candidate generation
vs a naive bucket scan, levenshtein blocking recall, sequence packing
vs a Python rescan."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_pagerank_matches_python_reference(spark, sf_dir):
    from map_reduce_for_dbpl_dataset_spark.queries.dblp import (
        PR_ITERS,
        PR_SCALE,
        pagerank,
    )

    got = {r.author: r.pr_scaled for r in pagerank(spark, sf_dir).collect()}

    # rebuild the same symmetric graph from the fixture and iterate the
    # identical integer recurrence in plain Python
    from map_reduce_for_dbpl_dataset_spark.functions.exprs import authors_or_editors
    from map_reduce_for_dbpl_dataset_spark.sources.parquet import publications

    rows = (
        publications(spark)
        .select("key", F.array_distinct(authors_or_editors()).alias("aus"))
        .collect()
    )
    edges = set()
    for r in rows:
        aus = [a for a in (r.aus or []) if a != ""]
        for x in aus:
            for y in aus:
                if x != y:
                    edges.add((x, y))
    nodes = sorted({s for s, _ in edges})
    deg = {n: 0 for n in nodes}
    for s, _ in edges:
        deg[s] += 1
    base = PR_SCALE // len(nodes)
    teleport = (15 * base) // 100
    rank = {n: base for n in nodes}
    for _ in range(PR_ITERS):
        incoming = {n: 0 for n in nodes}
        for s, d in edges:
            incoming[d] += rank[s] // deg[s]
        rank = {n: teleport + (85 * incoming[n]) // 100 for n in nodes}
    assert got == rank


def test_lsh_candidates_match_naive_bucket_scan(spark):
    from map_reduce_for_dbpl_dataset_spark.operators.dedup import (
        PERMS,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    rows = [
        (1, ["a b c", "b c d", "c d e"]),
        (2, ["a b c", "b c d", "c d e"]),  # identical to 1
        (3, ["a b c", "b c d", "x y z"]),  # close to 1/2
        (4, ["p q r", "q r s", "r s t"]),  # unrelated
    ]
    df = spark.createDataFrame(rows, "doc_id long, shingles array<string>")
    sigs = {r.doc_id: [r[f"sig_{k}"] for k in range(len(PERMS))] for r in minhash_signatures(df, "doc_id", "shingles").collect()}
    rows_per_band = len(PERMS) // 4
    naive = set()
    for a in sigs:
        for b in sigs:
            if a < b and any(
                sigs[a][bi * rows_per_band : (bi + 1) * rows_per_band]
                == sigs[b][bi * rows_per_band : (bi + 1) * rows_per_band]
                for bi in range(4)
            ):
                naive.add((a, b))
    got = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(minhash_signatures(df, "doc_id", "shingles"), "doc_id").collect()
    }
    assert got == naive
    assert (1, 2) in got  # identical docs always collide


def test_levenshtein_blocking_finds_all_injected_mutants(spark, sf_dir):
    from map_reduce_for_dbpl_dataset_spark.queries.pipeline import (
        LEV_SEEDS,
        q_dedup_levenshtein,
    )

    out = q_dedup_levenshtein(spark, sf_dir).collect()
    mutant_pairs = {(r.id_a, r.id_b): r.dist for r in out if r.id_b >= 300000}
    # every injected mutant (seed + ' qz') must be recovered at exactly
    # distance 3, blocked together by the shared 24-char prefix
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    for i in range(min(LEV_SEEDS, n_docs)):
        assert mutant_pairs.get((i, i + 300000)) == 3
    for r in out:
        assert r.id_a < r.id_b and r.dist <= 5


def test_sequence_pack_matches_python_rescan(spark, sf_dir):
    from map_reduce_for_dbpl_dataset_spark.queries.pipeline import (
        PACK_BUDGET,
        PACK_SHARDS,
        q_sequence_pack,
    )

    got = {
        (r.lang, r.shard, r.pack_id): (r.n_docs, r.n_tokens, r.first_doc, r.last_doc)
        for r in q_sequence_pack(spark, sf_dir).collect()
    }
    import re

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang", "text").collect()
    # mirror the query's (lang, shard = doc_id % PACK_SHARDS) stream keys
    by_stream: dict[tuple, list] = {}
    for r in sorted(docs, key=lambda r: r.doc_id):
        ntok = len(re.sub(r"\s+", " ", r.text.lower()).strip().split(" "))
        by_stream.setdefault((r.lang, r.doc_id % PACK_SHARDS), []).append((r.doc_id, ntok))
    expected: dict[tuple, list] = {}
    for (lang, shard), seq in by_stream.items():
        off = 0
        for doc_id, ntok in seq:
            pack = off // PACK_BUDGET
            expected.setdefault((lang, shard, pack), []).append((doc_id, ntok))
            off += ntok
    exp = {
        k: (len(v), sum(t for _, t in v), v[0][0], v[-1][0]) for k, v in expected.items()
    }
    assert got == exp


def test_kmeans_partitions_whole_corpus(spark, sf_dir):
    from map_reduce_for_dbpl_dataset_spark.queries.pipeline import q_kmeans

    rows = q_kmeans(spark, sf_dir).collect()
    n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert sum(r.n_members for r in rows) == n_vecs  # every vector assigned once
    assert all(r.sse >= 0 for r in rows)
    assert len({r.cluster for r in rows}) == len(rows)
