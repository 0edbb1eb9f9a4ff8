#!/usr/bin/env python3
"""Exact q116_dbscan oracle at sf0.1 — pure-python union-find replay of the
SQL oracle's semantics (radius-10 euclidean neighbors on (acctbal,
nationkey), core = deg+1 >= 5, clusters = CC over core-core edges labeled by
min core id, borders take min neighbor-core label, else noise) — used where
the recursive-CTE SQL formulation is infeasible (giant cluster => huge
closure). Compares against the Spark-side parquet dump."""
import sys, glob
import numpy as np
import pyarrow.parquet as pq

sfdir, outdir = sys.argv[1], sys.argv[2]
t = pq.read_table(f"{sfdir}/customer.parquet",
                  columns=["c_custkey", "c_acctbal", "c_nationkey"])
ids = np.asarray(t["c_custkey"], dtype=np.int64)
x = np.asarray(t["c_acctbal"], dtype=np.float64)
y = np.asarray(t["c_nationkey"], dtype=np.float64)
n = len(ids)
order = np.argsort(x, kind="stable")
xs, idx = x[order], order
# neighbor pairs: |dx|<=10 via sorted sliding window, then exact distance
pairs = []
j0 = 0
for i in range(n):
    xi = xs[i]
    while xs[j0] < xi - 10.0:
        j0 += 1
    for j in range(j0, i):
        dx = xi - xs[j]
        dy = y[idx[i]] - y[idx[j]]
        if dx * dx + dy * dy <= 100.0:
            pairs.append((idx[i], idx[j]))
deg = np.zeros(n, dtype=np.int64)
for a, b in pairs:
    deg[a] += 1; deg[b] += 1
core = (deg + 1) >= 5
parent = np.arange(n)
def find(a):
    while parent[a] != a:
        parent[a] = parent[parent[a]]; a = parent[a]
    return a
for a, b in pairs:
    if core[a] and core[b]:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
# label = min core id per component
comp_min = {}
for v in range(n):
    if core[v]:
        r = find(v)
        comp_min[r] = min(comp_min.get(r, ids[v]), ids[v])
label = {}
role = {}
for v in range(n):
    if core[v]:
        label[v] = comp_min[find(v)]; role[v] = "core"
nbrs = {}
for a, b in pairs:
    nbrs.setdefault(a, []).append(b); nbrs.setdefault(b, []).append(a)
for v in range(n):
    if not core[v]:
        cand = [label[u] for u in nbrs.get(v, []) if core[u]]
        if cand:
            label[v] = min(cand); role[v] = "border"
        else:
            label[v] = None; role[v] = "noise"
expect = {int(ids[v]): (label[v] if label[v] is None else int(label[v]), role[v])
          for v in range(n)}
files = glob.glob(f"{outdir}/q116_dbscan/*.parquet")
sp = pq.read_table(files[0]).to_pandas()
assert len(sp) == n, f"rowcount {len(sp)} != {n}"
bad = 0
for _, r in sp.iterrows():
    e = expect[int(r["c_custkey"])]
    got = (None if r["cluster_id"] is None or (isinstance(r["cluster_id"], float) and np.isnan(r["cluster_id"])) else int(r["cluster_id"]), r["role"])
    if got != e:
        if bad < 5:
            print("MISMATCH", r["c_custkey"], "spark", got, "expect", e)
        bad += 1
print(f"q116_dbscan: {'OK' if bad == 0 else f'{bad} mismatches'} ({n} rows, {len(pairs)} pairs)")
sys.exit(1 if bad else 0)
