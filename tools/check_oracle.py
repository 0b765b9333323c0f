"""Local replica of the driver's correctness gate.

Runs every registered query on Spark AND its DuckDB oracle at a given scale
factor, then compares row count, column names/dtypes, and (order-insensitive)
cell values. Stricter than the driver is likely to be: flags ANY non-exact
float so boundary-rounding risks surface here first.

Usage:  python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from endtoend_etl_openmeteo_spark import plans  # noqa: E402
from endtoend_etl_openmeteo_spark.session import (  # noqa: E402
    get_spark,
    release_persistent_rdds,
)
from endtoend_etl_openmeteo_spark.sources.tables import TABLES  # noqa: E402


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(normalize_cell(x) for x in v)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except Exception:
        pass
    return v


def sorted_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(normalize_cell(r[i]) for i in idx) for r in rows]
    key = lambda row: tuple((x is None, str(x)) for x in row)  # noqa: E731
    return [cols[i] for i in idx], sorted(out, key=key)


#: Coarse dtype classes — a schema mismatch across these is the kind the
#: driver's schema compare would flag (int vs float vs string vs temporal).
_SPARK_CLASS = {
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "float": "float", "double": "float",
    "string": "str", "boolean": "bool",
    "timestamp": "ts", "timestamp_ntz": "ts", "date": "date",
}
_DUCK_CLASS = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "HUGEINT": "int", "UTINYINT": "int", "USMALLINT": "int", "UINTEGER": "int",
    "UBIGINT": "int", "NUMBER": "float",
    "FLOAT": "float", "DOUBLE": "float", "REAL": "float", "DECIMAL": "float",
    "VARCHAR": "str", "STRING": "str", "BOOLEAN": "bool", "bool": "bool",
    "TIMESTAMP": "ts", "DATETIME": "ts", "TIMESTAMP_NS": "ts", "DATE": "date",
}


def _dtype_problems(name, spark_dtypes, duck_cols, duck_types) -> list[str]:
    spark_map = {c: t for c, t in spark_dtypes}
    out = []
    for col, dtype in zip(duck_cols, duck_types):
        dtype = str(dtype)
        st = spark_map.get(col)
        if st is None:
            continue  # column-name mismatch reported elsewhere
        sc = _SPARK_CLASS.get(st.split("(")[0], st)
        dc = _DUCK_CLASS.get(dtype.split("(")[0], dtype)
        if sc != dc and "array" not in st and "[]" not in dtype:
            out.append(f"dtype[{col}] spark={st}({sc}) duck={dtype}({dc})")
    return out


def compare(name, spark_cols, spark_rows, duck_cols, duck_rows) -> list[str]:
    problems = []
    if len(spark_rows) != len(duck_rows):
        problems.append(f"rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
        return problems
    sc, sr = sorted_rows(spark_cols, spark_rows)
    dc, dr = sorted_rows(duck_cols, duck_rows)
    if sc != dc:
        problems.append(f"columns spark={sc} duck={dc}")
        return problems
    n_mismatch = 0
    worst = None
    for a, b in zip(sr, dr):
        if a == b:
            continue
        for x, y in zip(a, b):
            if x == y:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if abs(x - y) <= 1e-9 * max(1.0, abs(x), abs(y)):
                    # tolerable, but flag: the driver may hash exactly
                    n_mismatch += 1
                    if worst is None:
                        worst = (a, b)
                    break
            n_mismatch += 1
            if worst is None:
                worst = (a, b)
            break
    if n_mismatch:
        problems.append(f"{n_mismatch}/{len(sr)} rows differ; first: spark={worst[0]} duck={worst[1]}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    registry = plans.load_all()
    if os.environ.get("CHECK_ORACLE_VANILLA"):
        # Driver-identical conditions: a bare session with none of the
        # engine's creation-time confs — only what the registry wrapper
        # applies at runtime. Catches results that depend on session
        # defaults (partition counts change float-sum orders).
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = get_spark("check-oracle")
    con = duck_con(sf_dir)
    failures, rows_only = [], []
    ann_results: dict[str, list] = {}
    n_run = 0
    for name, spec in sorted(registry.items()):
        if only and name not in only:
            continue
        n_run += 1
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            spark_cols = sdf.columns
            spark_dtypes = sdf.dtypes
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        finally:
            # The result is fully collected — drop any localCheckpoint
            # blocks the plan pinned, so query N+1 measures a clean
            # session instead of degrading under accumulated storage.
            release_persistent_rdds(spark)
        if name in (
            "q_ann_cosine",
            "q_ann_ivf",
            "q_ann_ivfpq",
            "q_ann_lsh",
            "q_ann_pq",
            "q_minhash_neardup",
            "q_dedup_clusters",
        ):
            ann_results[name] = [dict(zip(spark_cols, r)) for r in spark_rows]
        if spec.oracle is None:
            rows_only.append(name)
            print(f"rows  {name}: {len(spark_rows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            rel = con.sql(spec.oracle)
            duck_cols = list(rel.columns)
            duck_types = list(rel.types)
            duck_rows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        problems = compare(name, spark_cols, spark_rows, duck_cols, duck_rows)
        problems += _dtype_problems(name, spark_dtypes, duck_cols, duck_types)
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
        else:
            print(f"ok    {name}: {len(spark_rows)} rows [{time.time()-t0:.1f}s]")
    # Quantitative floor for the approximate ANN paths: a rows-only check
    # proves the query runs, not that it finds neighbors. Recall vs the
    # exact brute-force baseline must clear 0.5 (LSH measured ~0.6 at its
    # default 8x4 setting; IVF nprobe=2 similar on this data).
    RECALL_FLOOR = 0.5
    if "q_ann_cosine" in ann_results:
        exact = {(r["q_id"], r["n_id"]) for r in ann_results["q_ann_cosine"]}
        for approx_name in ("q_ann_ivf", "q_ann_ivfpq", "q_ann_lsh", "q_ann_pq"):
            if approx_name not in ann_results:
                continue
            approx = {(r["q_id"], r["n_id"]) for r in ann_results[approx_name]}
            recall = len(approx & exact) / max(len(exact), 1)
            status = "ok   " if recall >= RECALL_FLOOR else "FAIL "
            print(f"{status} recall[{approx_name}] = {recall:.3f} (floor {RECALL_FLOOR})")
            if recall < RECALL_FLOOR:
                failures.append(f"recall:{approx_name}")
    # MinHash banding recall vs EXACT shingle-Jaccard ground truth
    # (O(n^2) but bounded: runs only when the query was checked). The
    # round-1 seed-collapse bug (all signature families identical) kept
    # row counts plausible while gutting candidate recall — a floor on
    # true pair recovery is the only check that catches that class.
    if "q_minhash_neardup" in ann_results:
        from pyspark.sql import functions as F

        from endtoend_etl_openmeteo_spark.operators.dedup import (
            cpu_parallelize,
            shingles,
        )
        from endtoend_etl_openmeteo_spark.sources.tables import tbl

        d = cpu_parallelize(
            tbl(spark, sf_dir, "documents").select("doc_id", "text")
        ).select(F.col("doc_id").alias("id"), shingles("text", 3).alias("sh"))
        a, b = d.alias("a"), d.alias("b")
        jac = F.size(F.array_intersect("a.sh", "b.sh")) / F.size(
            F.array_union("a.sh", "b.sh")
        )
        truth = {
            (r["id_a"], r["id_b"])
            for r in a.join(b, F.col("a.id") < F.col("b.id"))
            .select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                jac.alias("j"),
            )
            .filter(F.col("j") >= 0.5)
            .collect()
        }
        found = {
            (r["id_a"], r["id_b"]) for r in ann_results["q_minhash_neardup"]
        }
        recall = len(found & truth) / max(len(truth), 1)
        status = "ok   " if recall >= RECALL_FLOOR else "FAIL "
        print(
            f"{status} recall[q_minhash_neardup] = {recall:.3f} "
            f"(floor {RECALL_FLOOR}, {len(truth)} true pairs)"
        )
        if recall < RECALL_FLOOR:
            failures.append("recall:q_minhash_neardup")
    # q_dedup_clusters label anchor (round-7 verdict task 7): the candidate
    # stage is approximate (MinHash — hash-specific, no SQL replay), but
    # GIVEN the emitted candidate pairs the clustering is exact connected
    # components. q_minhash_neardup emits the same pairs q_dedup_clusters
    # consumes (identical generator parameters), so DuckDB recomputes
    # components over those pairs with the q_cc_exact recursive closure and
    # the label assignments must match EXACTLY — not just be
    # consistency-checked.
    if "q_dedup_clusters" in ann_results and "q_minhash_neardup" in ann_results:
        import pandas as pd

        pairs_df = pd.DataFrame(
            [
                {"id_a": r["id_a"], "id_b": r["id_b"]}
                for r in ann_results["q_minhash_neardup"]
            ],
            columns=["id_a", "id_b"],
        )
        con.register("emitted_pairs", pairs_df)
        duck_labels = {
            (r[0], r[1])
            for r in con.sql(
                """
                WITH RECURSIVE sym AS (
                  SELECT id_a AS a, id_b AS b FROM emitted_pairs
                  UNION SELECT id_b, id_a FROM emitted_pairs
                ),
                reach(a, b) AS (
                  SELECT a, b FROM sym
                  UNION
                  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
                )
                SELECT a::BIGINT AS id, least(a, min(b))::BIGINT AS cluster_id
                FROM reach GROUP BY a
                """
            ).fetchall()
        }
        con.unregister("emitted_pairs")
        spark_labels = {
            (r["id"], r["cluster_id"]) for r in ann_results["q_dedup_clusters"]
        }
        ok = spark_labels == duck_labels
        status = "ok   " if ok else "FAIL "
        print(
            f"{status} cc[q_dedup_clusters] = exact components over emitted "
            f"pairs ({len(duck_labels)} labeled nodes)"
        )
        if not ok:
            sample = sorted(spark_labels ^ duck_labels)[:5]
            print(f"      label mismatches (sym diff sample): {sample}")
            failures.append("cc:q_dedup_clusters")
    print(
        f"\n{n_run - len(failures) - len(rows_only)} ok, "
        f"{len(rows_only)} rows-only, {len(failures)} FAILED"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
