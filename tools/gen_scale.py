"""Generate a scaled dataset by replicating a source scale factor K
times with shifted keys (TPC-H scaling model: Kx key domains, same
per-key densities; replica document text perturbed so near-dup rates
stay at the source level). Scratch data for the SCALING.md smoke only
— the correctness gates keep using the read-only driver testdata.

Usage: python tools/gen_scale.py [SRC] [DST] [K]
       (defaults: /root/testdata/sf0.1 /tmp/sf1 10)"""
import sys
import os

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute("SET threads TO 8")

# key-shift offsets: next power of 10 above each table's max key keeps
# shifted keys disjoint and joins consistent across replicas
OFF = {}
for t, k in [("orders", "o_orderkey"), ("customer", "c_custkey"),
             ("supplier", "s_suppkey"), ("part", "p_partkey"),
             ("events", "event_id"), ("documents", "doc_id"),
             ("embeddings", "vec_id"), ("lineitem", "l_orderkey")]:
    mx = con.execute(f"SELECT MAX({k}) FROM '{SRC}/{t}.parquet'").fetchone()[0]
    off = 1
    while off <= mx:
        off *= 10
    OFF[t] = off
OFF["user"] = con.execute(
    f"SELECT MAX(user_id) FROM '{SRC}/events.parquet'").fetchone()[0] + 1

REPL = "(SELECT UNNEST(RANGE({k})) AS rep) r".format(k=K)

jobs = {
    # dims that don't scale
    "region": f"SELECT * FROM '{SRC}/region.parquet'",
    "nation": f"SELECT * FROM '{SRC}/nation.parquet'",
    "customer": f"""
        SELECT c_custkey + rep*{OFF['customer']} AS c_custkey, c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM '{SRC}/customer.parquet', {REPL}""",
    "supplier": f"""
        SELECT s_suppkey + rep*{OFF['supplier']} AS s_suppkey, s_name,
               s_nationkey, s_acctbal
        FROM '{SRC}/supplier.parquet', {REPL}""",
    "part": f"""
        SELECT p_partkey + rep*{OFF['part']} AS p_partkey, p_name, p_brand,
               p_type, p_size, p_retailprice
        FROM '{SRC}/part.parquet', {REPL}""",
    "orders": f"""
        SELECT o_orderkey + rep*{OFF['orders']} AS o_orderkey,
               o_custkey + rep*{OFF['customer']} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{SRC}/orders.parquet', {REPL}""",
    "lineitem": f"""
        SELECT l_orderkey + rep*{OFF['orders']} AS l_orderkey,
               l_partkey + rep*{OFF['part']} AS l_partkey,
               l_suppkey + rep*{OFF['supplier']} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM '{SRC}/lineitem.parquet', {REPL}""",
    "events": f"""
        SELECT event_id + rep*{OFF['events']} AS event_id, ts,
               user_id + rep*{OFF['user']} AS user_id,
               event_type, value, props
        FROM '{SRC}/events.parquet', {REPL}""",
    # documents: perturb replica text so near-dup density stays at the
    # source rate instead of every doc gaining 9 exact twins
    "documents": f"""
        SELECT doc_id + rep*{OFF['documents']} AS doc_id,
               CASE WHEN rep = 0 THEN text
                    ELSE text || ' r' || rep || 'v' || (doc_id % 97) END AS text,
               lang, source, n_chars
        FROM '{SRC}/documents.parquet', {REPL}""",
    "embeddings": f"""
        SELECT vec_id + rep*{OFF['embeddings']} AS vec_id, embedding, label
        FROM '{SRC}/embeddings.parquet', {REPL}""",
}

for t, sql in jobs.items():
    out = f"{DST}/{t}.parquet"
    con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
    n = con.execute(f"SELECT COUNT(*) FROM '{out}'").fetchone()[0]
    print(t, n)
print("done ->", DST)
