#!/usr/bin/env python3
"""Deterministic scale-up of the driver's synthetic testdata.

Replicates each sf0.1 table R times with consistent key shifts (TPC-H-style
linear scaling), producing an sfR*0.1 directory the bench/verify harness can
point at. Used for the round-8 scale proof (BENCH_sf1.json): the goal is data
whose *per-key structure* is identical to sf0.1 — joins fan out linearly, not
quadratically — so a super-linear runtime is the engine's fault, not the
generator's.

Construction, per replica r in 0..R-1:
  - fact/dim keys shift by r * (table key cardinality); FK columns shift by
    the referenced table's stride, so referential integrity is preserved and
    every join's selectivity matches sf0.1 exactly.
  - entity names are re-derived from the shifted key (Customer#%09d etc.) so
    name-equality joins also stay linear.
  - documents: every whitespace token gets an "r{r}" prefix for r>0 and
    doc ids shift. Within a replica the near-dup/shingle structure is
    bit-identical to sf0.1; across replicas Jaccard is ~0, so dedup candidate
    generation scales linearly instead of exploding quadratically on 10-way
    exact duplicates. n_chars is recomputed.
  - embeddings: dim 0 perturbed by r*1e-3 to break cross-replica distance
    ties (keeps ANN top-k deterministic); vec ids shift.
  - events: ids/users shift, timestamps kept (densifies the stream R-fold,
    which is the realistic direction for a busier pipeline). The original
    timestamp[ns] physical type is preserved via pyarrow.
  - nation/region: fixed dimension tables, copied as-is (as in TPC-H).

Usage: python3 tools/make_sf.py /root/testdata/sf0.1 /tmp/sf1 10
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

src, dst, R = sys.argv[1], sys.argv[2], int(sys.argv[3])
import os
os.makedirs(dst, exist_ok=True)

STRIDE = dict(custkey=15000, suppkey=1000, partkey=20000, orderkey=150000,
              event_id=100000, user_id=1500, doc_id=5000, vec_id=2000)


def shift(col, stride, r):
    return pc.add(col, stride * r)


def replicate(name, transform):
    t = pq.read_table(f"{src}/{name}.parquet")
    t = t.replace_schema_metadata(None)
    parts = [transform(t, r) for r in range(R)]
    out = pa.concat_tables(parts)
    # modest row groups (~256k rows): a 100 TB table is thousands of files,
    # a local scale test is one — finer row groups let Spark's byte-range
    # splits actually parallelize the scan when maxPartitionBytes < file size
    pq.write_table(out, f"{dst}/{name}.parquet", row_group_size=262144)
    print(f"{name}: {t.num_rows} -> {out.num_rows}")


def renumber(fmt, keys):
    return pa.array([fmt % k for k in keys.to_pylist()], pa.string())


def customer(t, r):
    k = shift(t["c_custkey"], STRIDE["custkey"], r)
    return t.set_column(0, "c_custkey", k) \
            .set_column(1, "c_name", renumber("Customer#%09d", k))


def supplier(t, r):
    k = shift(t["s_suppkey"], STRIDE["suppkey"], r)
    return t.set_column(0, "s_suppkey", k) \
            .set_column(1, "s_name", renumber("Supplier#%09d", k))


def part(t, r):
    # p_name is a low-cardinality phrase ("large ring"), not key-derived;
    # keep it — part-name joins are grouped semantics at every sf
    return t.set_column(0, "p_partkey", shift(t["p_partkey"], STRIDE["partkey"], r))


def orders(t, r):
    return t.set_column(0, "o_orderkey", shift(t["o_orderkey"], STRIDE["orderkey"], r)) \
            .set_column(1, "o_custkey", shift(t["o_custkey"], STRIDE["custkey"], r))


def lineitem(t, r):
    return t.set_column(0, "l_orderkey", shift(t["l_orderkey"], STRIDE["orderkey"], r)) \
            .set_column(1, "l_partkey", shift(t["l_partkey"], STRIDE["partkey"], r)) \
            .set_column(2, "l_suppkey", shift(t["l_suppkey"], STRIDE["suppkey"], r))


def events(t, r):
    return t.set_column(0, "event_id", shift(t["event_id"], STRIDE["event_id"], r)) \
            .set_column(2, "user_id", shift(t["user_id"], STRIDE["user_id"], r))


def documents(t, r):
    ids = shift(t["doc_id"], STRIDE["doc_id"], r)
    if r == 0:
        return t.set_column(0, "doc_id", ids)
    texts = [" ".join(f"r{r}{w}" for w in s.split())
             for s in t["text"].to_pylist()]
    n = pa.array([len(s) for s in texts], pa.int64())
    return t.set_column(0, "doc_id", ids) \
            .set_column(1, "text", pa.array(texts, pa.string())) \
            .set_column(4, "n_chars", n)


def embeddings(t, r):
    ids = shift(t["vec_id"], STRIDE["vec_id"], r)
    if r == 0:
        return t.set_column(0, "vec_id", ids)
    vecs = [[v[0] + r * 1e-3] + v[1:] for v in
            (e.tolist() if hasattr(e, "tolist") else e
             for e in t["embedding"].to_pylist())]
    emb = pa.array(vecs, t.schema.field("embedding").type)
    return t.set_column(0, "vec_id", ids).set_column(1, "embedding", emb)


replicate("customer", customer)
replicate("supplier", supplier)
replicate("part", part)
replicate("orders", orders)
replicate("lineitem", lineitem)
replicate("events", events)
replicate("documents", documents)
replicate("embeddings", embeddings)
for dim in ("nation", "region"):
    t = pq.read_table(f"{src}/{dim}.parquet").replace_schema_metadata(None)
    pq.write_table(t, f"{dst}/{dim}.parquet")
    print(f"{dim}: copied")
print("done:", dst)
