#!/usr/bin/env python3
"""Scale-decade fixture generator (round-17 verdict #3): produce a
SELF-CONSISTENT pair of fixture scales — sf0.1 and sf1 from the SAME
generator law and seed — so graft.BytesAudit can measure shuffle-byte
growth across a SECOND decade (sf0.1 -> sf1) with an exactly-known
x10 data factor for EVERY table. The one-decade audit (driver sf0.01 ->
sf0.1) cannot separate a log factor from N^1.2 creep
(dedup_ngram_jaccard sat at 15.8x of the 20x bound); two decades can.

The law mirrors the driver fixtures' profiled shape, same as
tools/gen_seed2.py (schemas, value ranges, categorical sets, 31-word
vocabulary, 10..99 words/doc, ~10% near-dup tail, unit-L2 float32[64]
embeddings), with the two SF-dependent counts pinned to the driver's
observed scaling: documents = 50_000*SF (driver: 500 @0.01, 5_000
@0.1), embeddings = 20_000*SF (driver: 2_000 @0.1). Every other table
is the driver's own linear law, so sf0.1 -> sf1 is exactly x10 per
table.

Usage: tools/gen_scale.py <outDir> <sf> [seed]     (seed default 7777)
e.g.   tools/gen_scale.py testdata_scale/sf0.1 0.1
       tools/gen_scale.py testdata_scale/sf1   1
"""
import sys, json, os
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1]
SF = float(sys.argv[2])
SEED = int(sys.argv[3]) if len(sys.argv) > 3 else 7777
rng = np.random.default_rng(SEED)
os.makedirs(OUT, exist_ok=True)


def write(name, table):
    pq.write_table(table, f"{OUT}/{name}.parquet")
    print(name, table.num_rows, flush=True)


# ---- region / nation -------------------------------------------------
write("region", pa.table({
    "r_regionkey": pa.array(range(5), pa.int32()),
    "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]}))
write("nation", pa.table({
    "n_nationkey": pa.array(range(25), pa.int32()),
    "n_name": [f"NATION_{i}" for i in range(25)],
    "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())}))

# ---- customer / supplier --------------------------------------------
nCust = int(150000 * SF)
segs = ["MACHINERY", "FURNITURE", "BUILDING", "HOUSEHOLD", "AUTOMOBILE"]
write("customer", pa.table({
    "c_custkey": pa.array(range(nCust), pa.int64()),
    "c_name": [f"Customer#{i:09d}" for i in range(nCust)],
    "c_nationkey": pa.array(rng.integers(0, 25, nCust), pa.int32()),
    "c_acctbal": np.round(rng.uniform(-1000, 10000, nCust), 2),
    "c_mktsegment": [segs[i] for i in rng.integers(0, 5, nCust)]}))
nSupp = int(10000 * SF)
write("supplier", pa.table({
    "s_suppkey": pa.array(range(nSupp), pa.int64()),
    "s_name": [f"Supplier#{i:09d}" for i in range(nSupp)],
    "s_nationkey": pa.array(rng.integers(0, 25, nSupp), pa.int32()),
    "s_acctbal": np.round(rng.uniform(-1000, 10000, nSupp), 2)}))

# ---- part ------------------------------------------------------------
nPart = int(200000 * SF)
adjs = ["small", "red", "blue", "hot", "cold", "big", "green", "dim"]
nouns = ["ring", "widget", "bolt", "gear", "case", "tube", "cap", "pin"]
types = ["PROMO", "ECONOMY", "MEDIUM", "SMALL", "STANDARD", "LARGE"]
write("part", pa.table({
    "p_partkey": pa.array(range(nPart), pa.int64()),
    "p_name": [f"{adjs[a]} {nouns[b]}" for a, b in
               zip(rng.integers(0, 8, nPart), rng.integers(0, 8, nPart))],
    "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, nPart)],
    "p_type": [types[i] for i in rng.integers(0, 6, nPart)],
    "p_size": pa.array(rng.integers(1, 51, nPart), pa.int32()),
    "p_retailprice": np.round(rng.uniform(900, 1000, nPart), 2)}))

# ---- orders / lineitem ----------------------------------------------
nOrd = int(1500000 * SF)
statuses = ["P", "O", "F"]
prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
d0 = np.datetime64("1995-01-01")
odate = d0 + rng.integers(0, 2404, nOrd).astype("timedelta64[D]")
write("orders", pa.table({
    "o_orderkey": pa.array(range(nOrd), pa.int64()),
    "o_custkey": pa.array(rng.integers(0, nCust, nOrd), pa.int64()),
    "o_orderstatus": [statuses[i] for i in rng.integers(0, 3, nOrd)],
    "o_totalprice": np.round(rng.uniform(1000, 500000, nOrd), 2),
    "o_orderdate": pa.array(odate.astype("datetime64[us]")),
    "o_orderpriority": [prios[i] for i in rng.integers(0, 5, nOrd)]}))

nLine = 4 * nOrd
lOrd = np.repeat(np.arange(nOrd, dtype=np.int64), 4)
lNum = np.tile(np.arange(1, 5, dtype=np.int32), nOrd)
qty = rng.integers(1, 51, nLine).astype(float)
price = np.round(qty * rng.uniform(900, 2100, nLine), 2)
sdate = np.repeat(odate, 4) + rng.integers(1, 96, nLine).astype("timedelta64[D]")
write("lineitem", pa.table({
    "l_orderkey": pa.array(lOrd),
    "l_partkey": pa.array(rng.integers(0, nPart, nLine), pa.int64()),
    "l_suppkey": pa.array(rng.integers(0, nSupp, nLine), pa.int64()),
    "l_linenumber": pa.array(lNum),
    "l_quantity": qty,
    "l_extendedprice": price,
    "l_discount": np.round(rng.integers(0, 11, nLine) / 100.0, 2),
    "l_tax": np.round(rng.integers(0, 9, nLine) / 100.0, 2),
    "l_returnflag": [["A", "N", "R"][i] for i in rng.integers(0, 3, nLine)],
    "l_linestatus": [["O", "F"][i] for i in rng.integers(0, 2, nLine)],
    "l_shipdate": pa.array(sdate.astype("datetime64[us]"))}))

# ---- events ----------------------------------------------------------
nEv = int(1000000 * SF)
nUsers = max(1, int(15000 * SF))
etypes = ["signup", "purchase", "view", "click", "error"]
t0 = np.datetime64("2024-01-01T00:00:00.000000")
ets = t0 + np.sort(rng.integers(0, 30 * 86400 * 1000000, nEv)).astype("timedelta64[us]")
write("events", pa.table({
    "event_id": pa.array(range(nEv), pa.int64()),
    "ts": pa.array(ets),
    "user_id": pa.array(rng.integers(0, nUsers, nEv), pa.int64()),
    "event_type": [etypes[i] for i in rng.integers(0, 5, nEv)],
    "value": np.round(np.minimum(rng.exponential(50.0, nEv), 330.0), 2),
    "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, nEv)]}))

# ---- documents (driver law: 50_000 * SF) ----------------------------
VOCAB = ["a", "agg", "batch", "big", "column", "customer", "data", "dup",
         "fast", "filter", "group", "hash", "join", "key", "line", "merge",
         "order", "part", "query", "row", "scan", "slow", "small", "sort",
         "spark", "stream", "table", "the", "value", "vector", "window"]
langs = ["en", "en", "en", "fr", "de", "es", "zh"]
nDoc = int(50000 * SF)
base = []
for i in range(int(nDoc * 0.9)):
    n = int(rng.integers(10, 100))
    base.append([VOCAB[j] for j in rng.integers(0, len(VOCAB), n)])
texts = list(base)
while len(texts) < nDoc:  # near-dup tail mutations of random bases
    src = list(base[int(rng.integers(0, len(base)))])
    for _ in range(max(1, len(src) // 10)):
        src[int(rng.integers(0, len(src)))] = VOCAB[int(rng.integers(0, len(VOCAB)))]
    texts.append(src)
docs = [" ".join(t) for t in texts]
write("documents", pa.table({
    "doc_id": pa.array(range(nDoc), pa.int64()),
    "text": docs,
    "lang": [langs[i] for i in rng.integers(0, len(langs), nDoc)],
    "source": [f"src{i}" for i in rng.integers(0, 20, nDoc)],
    "n_chars": pa.array([len(d) for d in docs], pa.int64())}))

# ---- embeddings (driver law: 20_000 * SF) ---------------------------
nVec, dim = int(20000 * SF), 64
m = rng.normal(0, 1, (nVec, dim))
m = (m / np.linalg.norm(m, axis=1, keepdims=True)).astype(np.float32)
write("embeddings", pa.table({
    "vec_id": pa.array(range(nVec), pa.int64()),
    "embedding": pa.array([row for row in m.tolist()],
                          pa.list_(pa.float32())),
    "label": pa.array(rng.integers(0, 10, nVec), pa.int32())}))
print("done:", OUT, "seed", SEED, "sf", SF)
