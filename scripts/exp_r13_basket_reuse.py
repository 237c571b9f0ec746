import sys, os
sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")
import bench
from pyspark.sql import functions as F
from spark_bi5_datasource_spark import register
from spark_bi5_datasource_spark.plans.tables import t
from spark_bi5_datasource_spark.plans.round11_ops import basket_association_lift
from spark_bi5_datasource_spark.operators.pairs import unfold_sorted_pairs

SF = "/root/testdata/sf0.1"
spark = bench.build_spark()
register(spark)

def variant_b():
    li = t(spark, SF, "lineitem")
    ex = (li.select("l_orderkey", "l_partkey")
            .where(F.col("l_partkey").isNotNull())
            .repartition("l_orderkey"))
    dli = ex.distinct()
    n = dli.agg(F.countDistinct("l_orderkey").cast("bigint").alias("n_orders"))
    deg = dli.groupBy("l_partkey").agg(F.count("*").cast("bigint").alias("n_item"))
    baskets = (ex.groupBy("l_orderkey")
        .agg(F.expr("sort_array(collect_set(l_partkey))").alias("parts"))
        .where(F.expr("size(parts) >= 2")))
    pairs = (unfold_sorted_pairs(baskets, "parts")
        .groupBy("u", "v").agg(F.count("*").cast("bigint").alias("n_uv"))
        .where("n_uv >= 2"))
    du = deg.select(F.col("l_partkey").alias("u"), F.col("n_item").alias("n_u"))
    dv = deg.select(F.col("l_partkey").alias("v"), F.col("n_item").alias("n_v"))
    return (pairs.join(du, "u").join(dv, "v").crossJoin(F.broadcast(n))
        .select("u","v","n_uv","n_u","n_v",
            F.expr("CAST((n_uv * 1000000 div n_u) * n_orders div n_v AS BIGINT)").alias("lift_ppm"))
        .orderBy(F.desc("lift_ppm"), "u", "v").limit(500))

a = basket_association_lift(spark, SF)
b = variant_b()
ra = [tuple(r) for r in a.collect()]
rb = [tuple(r) for r in b.collect()]
print("equal:", ra == rb, len(ra), len(rb), flush=True)
if ra != rb:
    sys.exit(1)
import io
from contextlib import redirect_stdout
buf = io.StringIO()
with redirect_stdout(buf): b.explain("formatted")
plan = buf.getvalue()
print("B plan: scans=", plan.count("Scan parquet"), "exchanges=", sum(1 for l in plan.splitlines() if l.strip().startswith("(") and "Exchange" in l and "Reused" not in l), "reused=", plan.count("ReusedExchange"))
for tag, fn in [("A", lambda: basket_association_lift(spark, SF)), ("B", variant_b)] * 2:
    spark.sparkContext.setJobDescription(f"exp-basket:{tag}")
    print(tag, bench.timed(fn(), runs=3), flush=True)
