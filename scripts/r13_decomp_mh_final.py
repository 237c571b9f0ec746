import sys, os
sys.path.insert(0,"/root/repo"); os.chdir("/root/repo")
import bench
from pyspark.sql import Window, functions as F
from spark_bi5_datasource_spark import register
from spark_bi5_datasource_spark.plans.tables import t
from spark_bi5_datasource_spark.operators.dedup import minhash_signatures, _banded
SF="/root/testdata/sf0.1"
spark = bench.build_spark(); register(spark)
print("sentinel:", bench.scan_sentinel(spark, SF), flush=True)
def leg(name, df, runs=3):
    spark.sparkContext.setJobDescription(f"mh:{name}")
    print(name, bench.timed(df, runs=runs), flush=True)
docs = t(spark, SF, "documents")
ids = docs.select("doc_id", "text")
leg("scan", ids)
exact = ids.groupBy("text").agg(F.min("doc_id").alias("doc_id")).select("doc_id","text")
leg("exact", exact)
sigs = minhash_signatures(exact, "doc_id", "text", 3, 32)
leg("sigs", sigs)
banded = _banded(sigs, "doc_id", 32, 8)
leg("banded", banded)
w = Window.partitionBy("band", "bucket")
cand = (banded.withColumn("__rep", F.min(F.col("doc_id")).over(w))
        .filter(F.col("doc_id") > F.col("__rep"))
        .select(F.col("__rep").alias("id_a"), F.col("doc_id").alias("id_b"))
        .dropDuplicates(["id_a","id_b"]))
leg("cand_window", cand)
# groupBy+join variant of the representative step
reps = banded.groupBy("band","bucket").agg(F.min("doc_id").alias("__rep"))
cand2 = (banded.join(reps, ["band","bucket"])
        .filter(F.col("doc_id") > F.col("__rep"))
        .select(F.col("__rep").alias("id_a"), F.col("doc_id").alias("id_b"))
        .dropDuplicates(["id_a","id_b"]))
leg("cand_groupjoin", cand2)
import __spark_entry__ as e
leg("full_query", e.queries()["dedup_minhash"](spark, SF))
print("sentinel_end:", bench.scan_sentinel(spark, SF), flush=True)
