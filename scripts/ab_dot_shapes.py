"""Same-box A/B of dot-product implementation shapes (VERDICT r3 item 2).

The ann operators compute integer dot products over array<long> columns.
Round 1 (different hardware) measured the interpreted `zip_with`+`aggregate`
HOF BEATING a 64-term `element_at` chain (the chain falls out of
whole-stage codegen). Round 3 saw a 3.9x cross-instance swing on the
HOF-heavy `ann_ivf_topk` with byte-identical code, so the shapes must be
re-measured on each instance before trusting the default.

Shapes measured (all integer-exact, identical results asserted first):
  A. hof        — F.aggregate(F.zip_with(a,b,*),0,+)  (current `_dot`)
  B. chain      — sum of element_at(a,i)*element_at(b,i), i=1..64
  C. posexplode — posexplode(arrays_zip(a,b)) + groupBy(pair).sum
  D. pandas     — Arrow-batched pandas_udf, numpy int64 dot

Workload: sf embeddings replicated REPL times (default 50 → 100k rows at
sf0.1), each row dotted against NQ broadcast query vectors → REPL*rows*NQ
dot products of dim 64. Timed with the suite methodology (warm + best of 3,
noop sink). Usage:
    python scripts/ab_dot_shapes.py [sf_dir] [repl] [nq]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.functions import broadcast, pandas_udf  # noqa: E402

from servico_ocr_spark.operators.similarity import _int_vec  # noqa: E402
from servico_ocr_spark.session import get_spark  # noqa: E402

DIM = 64


def dot_hof(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def dot_chain(a, b):
    terms = [
        F.element_at(a, i) * F.element_at(b, i) for i in range(1, DIM + 1)
    ]
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    return total


def make_dot_pandas():
    # built lazily: pandas_udf return-type parsing needs an active session
    @pandas_udf("long")
    def dot_pandas(a: pd.Series, b: pd.Series) -> pd.Series:
        import numpy as np

        # each element arrives as a numpy array; stacking gives one
        # vectorized elementwise-multiply+sum per Arrow batch instead of a
        # Python loop per row
        am = np.stack(a.values).astype("int64")
        bm = np.stack(b.values).astype("int64")
        return pd.Series((am * bm).sum(axis=1))

    return dot_pandas


def build_pairs(spark, sf_dir: str, repl: int, nq: int):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = (
        emb.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(repl - 1))))
        .select(
            (F.col("vec_id") * repl + F.col("rep")).alias("neighbor_id"),
            _int_vec(F.col("embedding")).alias("v"),
        )
    )
    q = emb.limit(nq).select(
        F.col("vec_id").alias("query_id"), _int_vec(F.col("embedding")).alias("qv")
    )
    return base.join(broadcast(q), F.lit(True)).repartition(
        int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ).persist()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repl = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    nq = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        master=f"local[{cpus}]", shuffle_partitions=int(cpus),
        app_name="ab-dot-shapes",
    )
    spark.sparkContext.setLogLevel("ERROR")
    pairs = build_pairs(spark, sf_dir, repl, nq)
    n_pairs = pairs.count()
    dot_pandas = make_dot_pandas()

    def plan(shape: str):
        if shape == "posexplode":
            # arrays_zip + posexplode + per-pair sum; the groupBy shuffles
            # the exploded pair space (dim x pairs rows) — the price of
            # staying in whole-stage codegen
            exploded = pairs.select(
                "neighbor_id", "query_id",
                F.posexplode(F.arrays_zip("v", "qv")).alias("pos", "z"),
            )
            return exploded.groupBy("neighbor_id", "query_id").agg(
                F.sum(F.col("z.v") * F.col("z.qv")).alias("dot")
            )
        fn = {"hof": dot_hof, "chain": dot_chain,
              "pandas": dot_pandas}[shape]
        return pairs.select(
            "neighbor_id", "query_id", fn(F.col("v"), F.col("qv")).alias("dot")
        )

    # identity gate first: every shape must produce the same checksum
    sums = {}
    for shape in ("hof", "chain", "posexplode", "pandas"):
        row = plan(shape).agg(
            F.count("*").alias("n"),
            F.sum(F.col("dot") % 1000003).alias("s"),
            F.sum(F.abs(F.col("dot")) % 999983).alias("s2"),
        ).collect()[0]
        sums[shape] = (row["n"], row["s"], row["s2"])
    assert len(set(sums.values())) == 1, f"shapes disagree: {sums}"

    timings = {}
    for shape in ("hof", "chain", "posexplode", "pandas"):
        df = plan(shape)
        df.write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[shape] = round(best, 3)
    print(json.dumps({
        "metric": "dot_shape_seconds", "dim": DIM, "pairs": n_pairs,
        "identity": "all shapes checksum-equal", "timings": timings,
        "pairs_per_s": {k: round(n_pairs / v) for k, v in timings.items()},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
