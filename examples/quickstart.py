"""Quickstart: the three ways to use the engine.

Run:  python examples/quickstart.py  [sf_dir]   (default sf0.001)

1. Reference-shaped service: submit → status → preview → export —
   the workflow a rohitxsh/ensembl_lakehouse user already knows,
   minus the AWS account.
2. The operator library, called directly as DataFrame functions.
3. Snapshot tables: versioned writes, time travel, MERGE.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ensembl_lakehouse_spark import get_spark, snapshots
from ensembl_lakehouse_spark.engine import Engine
from ensembl_lakehouse_spark.operators import search, text


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="quickstart")
    work = tempfile.mkdtemp(prefix="elh_quickstart_")

    # 1 — the reference-shaped async lifecycle ------------------------
    eng = Engine(spark, work_dir=work)
    eng.catalog.register_dir(sf_dir)
    resp = eng.submit_query(
        "lineitem", "R",
        fields="l_orderkey,l_extendedprice,l_returnflag",
        condition="l_quantity > 40",
    )
    qid = resp["query_id"]
    eng.registry.wait(qid, timeout=120)
    print("status:", eng.query_status(qid)["status"])
    print("preview rows:", len(eng.query_preview(qid, max_results=5)["Rows"]) - 1)
    eng.export(qid, "parquet")
    eng.exports.wait_all()
    print("export:", eng.export(qid, "parquet")["status"])

    # ...and the operator library through the same lifecycle:
    aresp = eng.submit_analytics("bm25_search", sf_dir)
    eng.registry.wait(aresp["query_id"], timeout=120)
    print("bm25 via service:", eng.query_status(aresp["query_id"])["status"])

    # ...with per-request parameters (discover via analytics_params):
    print("bm25 params:", eng.analytics_params("bm25_search"))
    presp = eng.submit_analytics(
        "bm25_search", sf_dir, params={"terms": "table,join", "topk": 5}
    )
    eng.registry.wait(presp["query_id"], timeout=120)
    print("custom-terms bm25:", eng.query_status(presp["query_id"])["status"])

    # 2 — operators as plain DataFrame functions ----------------------
    top = search.bm25_search(spark, sf_dir)
    print("bm25 top hit:", top.first().asDict())
    quality = text.text_quality(spark, sf_dir)
    print("docs scored:", quality.count())

    # 2b — raw read-only SQL (Athena-parity; DDL/DML refused) --------
    sresp = eng.submit_sql(
        "SELECT l_returnflag, COUNT(*) AS n FROM lineitem "
        "GROUP BY l_returnflag ORDER BY l_returnflag"
    )
    eng.registry.wait(sresp["query_id"], timeout=120)
    print("raw sql:", eng.query_status(sresp["query_id"])["status"])

    # 3 — snapshot tables --------------------------------------------
    tbl = f"{work}/curated"
    v0 = snapshots.write_snapshot(tbl, quality.limit(10))
    v1 = snapshots.merge_snapshot(
        spark, tbl, quality.limit(3), key="doc_id"
    )
    print("versions:", [h["version"] for h in snapshots.history(tbl)])
    print("rows now:", snapshots.read_snapshot(spark, tbl).count(),
          "| rows at v0:", snapshots.read_snapshot(spark, tbl, version=v0).count())
    assert v1 == v0 + 1

    # 3a — data skipping: bloom point lookups + scoped MERGE ---------
    ids = f"{work}/ids"
    snapshots.write_snapshot(
        ids,
        spark.range(0, 2000).selectExpr("id AS k", "CAST(id AS STRING) AS v"),
        cluster_by=["k"], n_files=8, bloom_for=["k"],
    )
    keep, total = snapshots.files_for_point(ids, "k", 777)
    print(f"point lookup plans {len(keep)}/{total} files;",
          snapshots.read_snapshot(spark, ids, where_eq=("k", 777)).count(),
          "row(s)")
    before = set(snapshots._read_manifest(ids, 0)["files"])
    v = snapshots.merge_snapshot(
        spark, ids,
        spark.createDataFrame([(777, "UPDATED")], ["k", "v"]),
        key="k", scope_by="k", bloom_for=["k"],
    )
    after = set(snapshots._read_manifest(ids, v)["files"])
    print(f"scoped merge carried {len(before & after)}/{len(before)} files "
          "by reference")

    # 3a2 — governance lifecycle: delete, tag, CDC, retention --------
    gov = f"{work}/gov_tbl"
    snapshots.write_snapshot(gov, quality.limit(20))
    snapshots.tag_snapshot(gov, "pre-erasure")          # pin the bytes
    snapshots.delete_snapshot(
        spark, gov, where="doc_id < 3", op="erasure:req-1"
    )
    print("erased:", 20 - snapshots.read_snapshot(spark, gov).count(),
          "| tagged pre-erasure rows:",
          snapshots.read_snapshot(spark, gov, tag="pre-erasure").count(),
          "| stamp:", "erasure:req-1" in snapshots.committed_ops(gov))
    eng.register_snapshot_table("gov", gov)
    feed = eng.submit_table_changes("gov", 0, key="doc_id")
    eng.registry.wait(feed["query_id"], timeout=120)
    print("CDC feed rows:",
          eng.query_preview(feed["query_id"], max_results=10))
    print("retention dry-run:",
          eng.table_retention_report("gov", keep_versions=1))

    # 3b — resumable backfill over the corpus ------------------------
    from pyspark.sql import functions as F

    from ensembl_lakehouse_spark import backfill

    scored_dir = f"{work}/scores"
    out = backfill.run_backfill(
        spark,
        eng.catalog.spark.table("documents"),
        scored_dir,
        lambda df: df.select("doc_id", F.length("text").alias("score")),
        key_col="doc_id",
        n_chunks=4,
    )
    print("backfill:", out, "| rows:",
          snapshots.read_snapshot(spark, scored_dir).count())

    # 3c — incremental view maintenance from CDC deltas --------------
    from ensembl_lakehouse_spark import ivm

    rollup_dir = f"{work}/lang_rollup"
    src_docs = f"{work}/docs_src"
    snapshots.write_snapshot(
        src_docs, quality.select("doc_id", "lang", "n_tokens")
    )
    print("ivm:", ivm.maintain_rollup(spark, src_docs, rollup_dir, ["lang"], "n_tokens"))
    snapshots.merge_snapshot(
        spark, src_docs,
        quality.select("doc_id", "lang", "n_tokens").limit(5)
        .withColumn("n_tokens", F.col("n_tokens") + 100),
        key="doc_id",
    )
    print("ivm:", ivm.maintain_rollup(spark, src_docs, rollup_dir, ["lang"], "n_tokens"))
    print("rollup rows:", ivm.read_rollup(spark, rollup_dir).count())

    # 3d — persisted ANN index: build, serve, incremental add --------
    from ensembl_lakehouse_spark import ann_index

    idx_dir = f"{work}/ivf_index"
    ann_index.build_ivf_index(spark, sf_dir, idx_dir)
    print("index top hit:",
          ann_index.query_ivf_index(spark, sf_dir, idx_dir).first().asDict())
    # stamped add: re-running the same batch id is a no-op
    from ensembl_lakehouse_spark.operators.similarity import _split

    _, corpus = _split(spark, sf_dir)
    batch = corpus.limit(5).select("vec_id", "label", "embedding")
    v = ann_index.add_to_ivf_index(spark, idx_dir, batch, op="batch-001")
    assert ann_index.add_to_ivf_index(spark, idx_dir, batch, op="batch-001") == v
    print("index versions:", [h["op"] for h in snapshots.history(idx_dir)])

    # 3e — round-6: UPDATE, MV rewrite, metadata counts, SQL views --
    from ensembl_lakehouse_spark.plans import rewrite as RW

    # COW row-level UPDATE: only files holding matches rewrite
    snapshots.update_snapshot(
        spark, src_docs, where="lang = 'en'",
        set={"n_tokens": "n_tokens + 1"},
    )
    # metadata-only COUNT(*): zero data reads, exact at any size
    print("rowcount (manifest):", snapshots.table_rowcount(src_docs))
    # MV rewrite: the maintained rollup answers matching aggregates
    ivm.maintain_rollup(spark, src_docs, rollup_dir, ["lang"], "n_tokens")
    cat = RW.RollupCatalog()
    cat.register("by_lang", rollup_dir, src_docs, ["lang"], "n_tokens")
    df, why = RW.answer_aggregate(
        spark, cat, src_docs, ["lang"],
        {"docs": ("count", ""), "tokens": ("sum", "n_tokens")},
    )
    print("aggregate answered by:", why["used"], "->", df.first().asDict())
    # registered tables are raw-SQL-queryable at the published version
    eng.register_snapshot_table("docs", src_docs)
    resp = eng.submit_sql("SELECT lang, COUNT(*) AS n FROM snap_docs GROUP BY lang")
    eng.registry.wait(resp["query_id"], timeout=120)
    print("sql over snapshot view:", eng.query_status(resp["query_id"])["status"])

    eng.close()
    spark.stop()


if __name__ == "__main__":
    main()
