"""Scale-sanity smoke: blow the text/embedding tables up Nx and time the
operators with superlinear failure modes (candidate-pair generation,
banded joins, ANN scans, label propagation).

A correct-but-quadratic operator looks fine at sf0.1 and dies at 100 TB;
this harness catches the shape early by checking the Nx runtime against
Nx * (1 + slack) of the 1x runtime. IDs are offset per replica so
near-dup structure scales realistically (each replica is an exact dup
cluster of its source doc — cluster count grows linearly, cluster size
stays bounded).

Usage: python tools/scale_smoke.py [replicas] [sf_dir]
Writes scaled parquet under .tmp/scale_smoke/ (removed on success).
"""

from __future__ import annotations

import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from endtoend_etl_openmeteo_spark import plans  # noqa: E402
from endtoend_etl_openmeteo_spark.session import get_spark  # noqa: E402

#: Queries with a superlinear-risk shape, and the factor by which their
#: runtime may grow beyond linear at Nx before we call it a regression.
#: (Near-dup candidate generation grows with duplicate-cluster size — the
#: replica construction keeps clusters bounded, so ~linear is expected.)
WATCHED = {
    "q_minhash_neardup": 3.0,
    "q_boilerplate_ngrams": 3.0,
    "q_dedup_exact": 3.0,
    "q_dedup_clusters": 4.0,  # + extra propagation rounds
    "q_ann_cosine": 3.0,  # linear in corpus for fixed queries
    "q_ann_pq": 3.0,
    "q_simhash": 3.0,
    "q_span_dedup": 3.0,
    "q_tfidf": 3.0,
    "q_lm_score": 3.0,
    "q_neardup_incremental": 4.0,  # banded index probe + bucket prune
    "q_bpe_encode": 3.0,  # sample-trained; encode is map-only
    "q_word_entropy": 3.0,  # map-only fold — must stay embarrassingly linear
}


def scale_tables(spark, src: str, dst: str, replicas: int) -> None:
    docs = spark.read.parquet(f"{src}/documents.parquet")
    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    n_docs = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    n_vecs = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    r = F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("r")
    (
        docs.select("*", r)
        .withColumn("doc_id", F.col("doc_id") + F.col("r") * n_docs)
        .drop("r")
        .write.mode("overwrite")
        .parquet(f"{dst}/documents.parquet")
    )
    (
        emb.select("*", r)
        .withColumn("vec_id", F.col("vec_id") + F.col("r") * n_vecs)
        .drop("r")
        .write.mode("overwrite")
        .parquet(f"{dst}/embeddings.parquet")
    )
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events"):
        # testdata has shipped single-file parquet so far, but survive a
        # directory-style regeneration too
        src_path = Path(f"{src}/{t}.parquet")
        if src_path.is_dir():
            shutil.copytree(src_path, f"{dst}/{t}.parquet", dirs_exist_ok=True)
        else:
            shutil.copy(src_path, f"{dst}/{t}.parquet")


def time_queries(spark, registry, sf_dir: str) -> dict[str, float]:
    out = {}
    for name in WATCHED:
        t0 = time.perf_counter()
        registry[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = time.perf_counter() - t0
    return out


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = str(REPO / ".tmp" / "scale_smoke")
    registry = plans.load_all()
    spark = get_spark("scale-smoke")

    # warmups mirroring bench.py
    registry["q_scan"].fn(spark, src).write.format("noop").mode("overwrite").save()
    spark.range(1000).selectExpr(
        "aggregate(sequence(1, 20), cast(0 as bigint), (a, x) -> a + x) s"
    ).write.format("noop").mode("overwrite").save()

    base = time_queries(spark, registry, src)
    base = time_queries(spark, registry, src)  # second pass = warm numbers
    scale_tables(spark, src, dst, replicas)
    scaled = time_queries(spark, registry, dst)

    failures = []
    for name, slack in WATCHED.items():
        ratio = scaled[name] / max(base[name], 1e-9)
        budget = replicas * slack
        status = "ok  " if ratio <= budget else "FAIL"
        print(
            f"{status} {name}: 1x={base[name]:.2f}s {replicas}x={scaled[name]:.2f}s "
            f"ratio={ratio:.1f} (budget {budget:.0f}x)"
        )
        if ratio > budget:
            failures.append(name)
    if failures:
        print(f"SUPERLINEAR: {failures}")
        sys.exit(1)
    shutil.rmtree(dst, ignore_errors=True)
    print(f"all {len(WATCHED)} watched operators within {replicas}x linear budget")


if __name__ == "__main__":
    main()
