"""Regenerate PLANS.md: formatted physical plans for representative
queries at sf0.1 — the evidence artifacts behind SCALING.md's claims."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simple_etl_pipeline_spark.session import get_spark
import __spark_entry__ as e

PICKS = {
    "q6_revenue_filter": "full predicate pushdown + column pruning + one partial/final agg",
    "q5_region_revenue": "broadcast dimension chain; only fact joins shuffle",
    "orderby_limit_top_orders": "global top-k as TakeOrderedAndProject (no full sort)",
    "window_topk_orders_per_customer": "per-group top-k: single hash partition + in-partition sort",
    "dedup_minhash_lsh": "keyed shuffles only (shingle/doc/band); no cross join anywhere",
    "ref_transform_full": "entire reference pipeline in pipelined codegen stages",
}

def main():
    spark = get_spark(shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    out = ["# PLANS — captured physical plans (sf0.1, AQE on)", "",
           "Generated evidence for SCALING.md claims: run `python tools/dump_plans.py`",
           "to regenerate. Key things to look for are noted per query.", ""]
    for name, why in PICKS.items():
        plan = qs[name](spark, sf)._jdf.queryExecution().explainString(mode)
        out.append(f"## {name}\n\n*{why}*\n\n```\n{plan.strip()}\n```\n")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    open(os.path.join(root, "PLANS.md"), "w").write("\n".join(out))

if __name__ == "__main__":
    main()
