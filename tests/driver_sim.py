"""Driver simulation: vanilla SparkSession, import __spark_entry__, smoke entry(),
run queries() vs oracle_sql() at sf0.01 with order-insensitive value-hash."""
import hashlib, math, sys
import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as mod

spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

# smoke: entry
df = mod.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={df.schema.simpleString()}")
assert len(rows) > 0

qs, osql = mod.queries(), mod.oracle_sql()
assert set(osql) <= set(qs), "oracle keys not subset of queries"
print(f"{len(qs)} queries, {len(osql)} with oracle")

sf = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

def norm(v):
    if v is None or (isinstance(v, float) and math.isnan(v)): return "NULL"
    if isinstance(v, float): return f"{round(v,4):.4f}"
    return str(v)

def h(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()

fails = []
for name, fn in qs.items():
    sdf = fn(spark, sf)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    if name not in osql:
        print(f"{name}: rows-only {len(srows)}")
        continue
    ores = con.execute(osql[name])
    ocols = [d[0] for d in ores.description]
    orows = ores.fetchall()
    ok_schema = sorted(scols) == sorted(ocols)
    ok_count = len(srows) == len(orows)
    ok_hash = h(scols, srows) == h(ocols, orows)
    status = "OK" if (ok_schema and ok_count and ok_hash) else "FAIL"
    if status == "FAIL":
        fails.append((name, ok_schema, ok_count, ok_hash))
    print(f"{name}: {status} rows={len(srows)}/{len(orows)} schema={ok_schema} hash={ok_hash}")
print("FAILS:", fails if fails else "none")
