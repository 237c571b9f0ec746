import sys, os
sys.path.insert(0,"/root/repo"); os.chdir("/root/repo")
os.environ.setdefault("SPARK_GRAFT_MEM", "32g")
import bench
from pyspark.sql import functions as F
from spark_bi5_datasource_spark import register
from spark_bi5_datasource_spark.plans.tables import t
from spark_bi5_datasource_spark.operators.pairs import unfold_sorted_pairs
from spark_bi5_datasource_spark.plans.round11_ops import basket_association_lift
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = bench.build_spark(); register(spark)

def variant_direct(sf):
    li = t(spark, sf, "lineitem")
    ex = li.select("l_orderkey", "l_partkey").repartition("l_orderkey")
    n = li.select("l_orderkey").agg(
        F.countDistinct("l_orderkey").cast("bigint").alias("n_orders"))
    deg = li.select("l_orderkey","l_partkey").groupBy("l_partkey").agg(
        F.countDistinct("l_orderkey").cast("bigint").alias("n_item"))
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

print("sentinel:", bench.scan_sentinel(spark, SF), flush=True)
a = basket_association_lift(spark, SF)
b = variant_direct(SF)
if "sf0.1" in SF and "/tmp/" not in SF:
    ra = [tuple(r) for r in a.collect()]; rb = [tuple(r) for r in b.collect()]
    print("equal:", ra == rb, len(ra), len(rb), flush=True)
    assert ra == rb
runs = 2
for tag, fn in [("cur", lambda: basket_association_lift(spark, SF)), ("direct", lambda: variant_direct(SF))] * 2:
    spark.sparkContext.setJobDescription(f"bd:{tag}")
    print(tag, bench.timed(fn(), runs=runs), flush=True)
print("sentinel_end:", bench.scan_sentinel(spark, SF), flush=True)
