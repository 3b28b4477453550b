#!/usr/bin/env python
"""Build the gitignored 10× scale-probe corpus (ARCHITECTURE.md
"Measured scaling"): every growth factor quoted there is measured
against the output of this script so the probe is reproducible.

Recipe (documented in ARCHITECTURE.md since round 3):
* documents — base sf0.1 ∪ 9 replicas with offset doc_ids and a
  per-replica suffix token (replicas are NEAR-dups of their base doc,
  so dedup ops see realistic duplicate structure, not random noise);
* embeddings — 9 cyclically-rotated copies with offset vec_ids
  (rotation preserves norms and pairwise-dot statistics);
* events — 9 copies with offset event/user ids (10× the user domain);
* orders/lineitem — 9 copies with offset order/cust/supp keys (the
  purchase graph becomes 10 disjoint copies: 10× nodes AND edges);
* dimension tables — copied as-is.

Usage: python tools_build_scale_probe.py [src_sf_dir] [dest_dir]
       [--replicas N] [--only documents]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from etl_github_spark.session import get_spark

REPLICAS = 10


def gz_probe() -> None:
    """10× FILE-SIZE probe for the gzip decompress-split claim
    (``--gz-probe``): the warm bench pair at the ~3 MB toy size hides
    the parallelism win behind job overhead, so this reruns the same
    single-task-vs-split_landing measurement at 10× the file size —
    where the non-splittable straggler actually bites. Factors quoted
    in ARCHITECTURE.md "Measured scaling" come from this recipe."""
    import time

    from bench import bench_gha_ingest_gz

    spark = get_spark("gz-probe")
    spark.sparkContext.setLogLevel("ERROR")
    bench_gha_ingest_gz(spark, n_copies=200)  # JVM/codegen warmup
    results = {}
    for n in (1500, 15000):
        t0 = time.perf_counter()
        single, split = bench_gha_ingest_gz(spark, n_copies=n)
        results[n] = (single, split)
        print(
            f"n_copies={n}: single_task={single:.2f}s "
            f"split_landing={split:.2f}s win={single / split:.2f}x "
            f"(pair wall {time.perf_counter() - t0:.1f}s)"
        )
    s1, p1 = results[1500]
    s10, p10 = results[15000]
    print(
        f"10x-size growth: single_task {s10 / s1:.2f}x, "
        f"split_landing {p10 / p1:.2f}x"
    )


def main() -> None:
    if "--gz-probe" in sys.argv:
        gz_probe()
        return
    argv = list(sys.argv[1:])
    replicas = REPLICAS
    only = None
    if "--replicas" in argv:  # e.g. --replicas 100 for the 100x probe
        i = argv.index("--replicas")
        replicas = int(argv[i + 1])
        del argv[i : i + 2]
    if "--only" in argv:  # build a single table (documents for LSH probes)
        i = argv.index("--only")
        only = argv[i + 1]
        del argv[i : i + 2]
    src = argv[0] if len(argv) > 0 else "/root/testdata/sf0.1"
    dest = argv[1] if len(argv) > 1 else ".scale_probe"
    spark = get_spark("scale-probe-build")
    spark.sparkContext.setLogLevel("ERROR")

    from etl_github_spark.io.tables import load_table

    docs = load_table(spark, src, "documents")
    off = docs.agg(F.max("doc_id")).first()[0] + 1
    parts = [docs]
    for i in range(1, replicas):
        parts.append(
            docs.select(
                (F.col("doc_id") + i * off).alias("doc_id"),
                F.concat("text", F.lit(f" repl{i}")).alias("text"),
                "lang",
                "source",
                F.length(F.concat("text", F.lit(f" repl{i}"))).alias("n_chars"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(f"{dest}/documents.parquet")
    if only == "documents":
        print(f"probe corpus (documents only, {replicas}x) written to {dest}")
        return

    emb = load_table(spark, src, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    voff = emb.agg(F.max("vec_id")).first()[0] + 1
    eparts = [emb]
    for i in range(1, replicas):
        # rotate by i mod dim — replicas beyond the dimensionality wrap
        # (r14: --replicas 100 > dim 64 made `dim - i` negative; a wrapped
        # rotation keeps norms/dot statistics exactly like the 10x recipe)
        r = i % dim
        if r == 0:
            rot = F.col("embedding")
        else:
            rot = F.concat(
                F.slice("embedding", r + 1, dim - r), F.slice("embedding", 1, r)
            )
        eparts.append(
            emb.select(
                (F.col("vec_id") + i * voff).alias("vec_id"),
                rot.alias("embedding"),
                *[c for c in emb.columns if c not in ("vec_id", "embedding")],
            )
        )
    ue = eparts[0]
    for p in eparts[1:]:
        ue = ue.unionByName(p)
    ue.write.mode("overwrite").parquet(f"{dest}/embeddings.parquet")

    ev = spark.read.parquet(f"{src}/events.parquet")  # keep raw ns-long ts
    eoff = ev.agg(F.max("event_id")).first()[0] + 1
    uoff = ev.agg(F.max("user_id")).first()[0] + 1
    evp = [ev]
    for i in range(1, replicas):
        evp.append(
            ev.withColumn("event_id", F.col("event_id") + i * eoff).withColumn(
                "user_id", F.col("user_id") + i * uoff
            )
        )
    uev = evp[0]
    for p in evp[1:]:
        uev = uev.unionByName(p)
    uev.write.mode("overwrite").parquet(f"{dest}/events.parquet")

    orders = load_table(spark, src, "orders")
    li = load_table(spark, src, "lineitem")
    ooff = orders.agg(F.max("o_orderkey")).first()[0] + 1
    coff = orders.agg(F.max("o_custkey")).first()[0] + 1
    soff = li.agg(F.max("l_suppkey")).first()[0] + 1
    # offset part keys too: without it every co-purchase pair's support
    # multiplies by REPLICAS (superlinear TRUE output), instead of the
    # graph becoming REPLICAS disjoint copies (10× nodes AND edges) —
    # the growth factor we actually want to measure.
    poff = li.agg(F.max("l_partkey")).first()[0] + 1
    op, lp = [orders], [li]
    for i in range(1, replicas):
        op.append(
            orders.withColumn("o_orderkey", F.col("o_orderkey") + i * ooff)
            .withColumn("o_custkey", F.col("o_custkey") + i * coff)
        )
        lp.append(
            li.withColumn("l_orderkey", F.col("l_orderkey") + i * ooff)
            .withColumn("l_suppkey", F.col("l_suppkey") + i * soff)
            .withColumn("l_partkey", F.col("l_partkey") + i * poff)
        )
    uo, ul = op[0], lp[0]
    for p in op[1:]:
        uo = uo.unionByName(p)
    for p in lp[1:]:
        ul = ul.unionByName(p)
    uo.write.mode("overwrite").parquet(f"{dest}/orders.parquet")
    ul.write.mode("overwrite").parquet(f"{dest}/lineitem.parquet")

    for t in ("region", "nation", "customer", "supplier", "part"):
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{dest}/{t}.parquet"
        )
    print(f"probe corpus written to {dest}")


if __name__ == "__main__":
    main()
