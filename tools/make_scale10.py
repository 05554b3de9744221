"""Build a 10x replica of the sf0.1 tables in /tmp/sf1 for scale-up
measurement (SCALE.md §'Measured 10x scale-up').

Replication rules keep query semantics meaningful:
- documents: doc_id offset per replica; text of replicas 1..9 salted with
  a per-replica token every other word, so replicas are NOT near-dups of
  the original (cross-replica Jaccard ~0.2 < 0.5) and near-dup outputs
  scale ~linearly instead of quadratically;
- events/embeddings: id offsets only (embeddings replicas are identical
  vectors — deliberate: models exact-duplicate vectors at scale);
- orders/lineitem: orderkey offsets only — customer/supplier keys are
  NOT offset, so each dimension row simply gains 10x fact rows (realistic
  growth; dimension tables stay dimension-sized);
- region/nation/customer/supplier copied as-is.

Usage: python tools/make_scale10.py  (then run queries with sf_dir=/tmp/sf1)
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_streaming_twitter_spark.session import build_session  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1"
OFFSET = 10_000_000
REPLICAS = 10

SPECS: dict[str, tuple[list[str], str | None]] = {
    "documents": (["doc_id"], "text"),
    "events": (["event_id", "user_id"], None),
    "orders": (["o_orderkey"], None),
    "lineitem": (["l_orderkey"], None),
    "embeddings": (["vec_id"], None),
}


def main() -> None:
    spark = build_session("make-scale10")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(DST, exist_ok=True)
    for table, (id_cols, text_col) in SPECS.items():
        base = spark.read.parquet(f"{SRC}/{table}.parquet")
        parts = []
        for k in range(REPLICAS):
            p = base
            for c in id_cols:
                p = p.withColumn(c, F.col(c) + F.lit(k * OFFSET))
            if text_col and k > 0:
                p = p.withColumn(
                    text_col, F.regexp_replace(F.col(text_col), r"(\w+ \w+)", f"$1 z{k}")
                )
            parts.append(p)
        union = parts[0]
        for p in parts[1:]:
            union = union.unionByName(p)
        union.repartition(16).write.mode("overwrite").parquet(f"{DST}/{table}.parquet")
        print(f"{table}: x{REPLICAS} written")
    for table in ("customer", "supplier", "nation", "region"):
        shutil.copy(f"{SRC}/{table}.parquet", f"{DST}/{table}.parquet")
    print("done:", DST)


if __name__ == "__main__":
    main()
