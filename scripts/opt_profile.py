"""Phase-level timing for the staged maintenance composites (guide §1:
isolate where the seconds go before touching anything). Replicates the
exact call sequence of the target query but wraps each phase in a timer.

Usage: python scripts/opt_profile.py x176 [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gwasdb_spark.session import get_spark  # noqa: E402

SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"  {label:<28s} {dt:8.3f} s")
    return out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def profile_x176(spark):
    import numpy as np

    from gwasdb_spark.operators.ann_graph import (
        build_graph_sidecar,
        graph_probe_persisted,
    )
    from gwasdb_spark.operators.ann_index import (
        build_cell_index,
        delete_from_cell_index,
        read_cell_index,
        upsert_cell_index,
    )
    from gwasdb_spark.catalog import table
    from gwasdb_spark.plans.helpers import stage_dir

    e = table(spark, SF, "embeddings")
    batch = e.filter(F.col("vec_id") % 11 == 7).select("vec_id", "embedding")
    victims = e.filter(F.col("vec_id") % 23 == 1).select("vec_id")
    base = stage_dir("profile_x176")
    for rep in range(3):
        print(f"-- x176 rep {rep} --")
        if not os.path.isdir(os.path.join(base, "index")):
            t("build_cell_index", lambda: build_cell_index(
                e.filter(F.col("vec_id") % 11 != 7).select(
                    "vec_id", "embedding"), base))
            t("build_graph_sidecar", lambda: build_graph_sidecar(
                spark, base, R=6))
        t("upsert_cell_index", lambda: upsert_cell_index(spark, base, batch))
        t("delete_from_cell_index", lambda: delete_from_cell_index(
            spark, base, victims))

        def serve():
            qrows = (
                read_cell_index(spark, base)
                .filter(F.col("vec_id").between(1, 5))
                .select("vec_id", "embedding")
                .collect()
            )
            probe_rows = []
            for r in qrows:
                qv = np.asarray(r["embedding"], dtype=np.float64)
                top = np.lexsort((np.arange(qv.size), -qv))[:4]
                for c in top:
                    probe_rows.append(
                        (int(r["vec_id"]),
                         [float(x) for x in r["embedding"]], int(c) + 1))
            probes = spark.createDataFrame(
                probe_rows, "query_id long, q_vec array<float>, cell int")
            noop(graph_probe_persisted(spark, base, probes, k=10, ef=0))

        t("serve (probe+beam+merge)", serve)


def profile_m10(spark):
    from gwasdb_spark.plans import QUERIES
    from gwasdb_spark.plans.mining_ops import STAGED_RESETS

    for rep in range(2):
        STAGED_RESETS["m10_cdc_replicate"](SF)
        print(f"-- m10 rep {rep} (cold) --")
        t("m10 full", lambda: noop(
            QUERIES["m10_cdc_replicate"].fn(spark, SF)))


def main():
    spark = get_spark("opt_profile")
    spark.sparkContext.setLogLevel("ERROR")
    which = sys.argv[1]
    {"x176": profile_x176, "m10": profile_m10}[which](spark)


if __name__ == "__main__":
    main()
