import sys, os, json
sys.path.insert(0,"/root/repo"); os.chdir("/root/repo")
os.environ.setdefault("SPARK_GRAFT_MEM", "32g")
import bench
from bench import synth_scaled_dir, build_spark, timed, scan_sentinel
from spark_bi5_datasource_spark import register
import time
SRC="/root/testdata/sf0.1"
t0=time.time()
d = synth_scaled_dir(SRC, 100, tables=["documents","lineitem","events","embeddings",
    "orders","customer","supplier","nation","region","part"])
print("synth done in", round(time.time()-t0,1), "s ->", d, flush=True)
spark = build_spark(); register(spark)
import __spark_entry__ as e
qs = e.queries()
out={}
print("sentinel:", scan_sentinel(spark, d), flush=True)
for name in ("dedup_minhash","dedup_winnowing_fingerprints","dedup_winnow_pairs",
             "tok_zipf_profile","basket_association_lift","sql_tpch_q21"):
    df = qs[name](spark, d)
    spark.sparkContext.setJobDescription(f"x100:{name}")
    out[name] = timed(df, runs=2)
    print(name, out[name], flush=True)
out["sentinel_end"] = scan_sentinel(spark, d)
print("sentinel_end:", out["sentinel_end"], flush=True)
json.dump({"x":100,"queries":out}, open("/tmp/x100_probe2.json","w"), indent=1)
