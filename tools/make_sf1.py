#!/usr/bin/env python3
"""Synthesize an sf1-equivalent dataset (10x sf0.1) for builder-side
scale-stress benching.

Fact tables are replicated 10x with consistent key offsets (copy i shifts
each key family by i * (max_key + 1), so intra-copy join relationships are
preserved and copies never collide); the nation/region dims stay fixed,
like TPC-H scaling. All physical types are preserved via pyarrow (the
events table's timestamp[ns] column must survive the copy — the Spark-side
reader depends on it).

With --perturb, copied CONTENT is also varied so the corpus grows like
real data instead of exact duplication: document texts get a per-copy
marker token interleaved every 5 tokens (kills cross-copy near-dup
similarity), embeddings get one per-copy coordinate bump (kills identical
directions), and supplier/customer balances shift per copy (spreads the
derived point geometry). Without --perturb every row has 10 exact copies —
an adversarial max-duplication corpus where near-dup/ANN/grid queries do
quadratically more LEGITIMATE work (every copy-group is a true near-dup
clique); both corpora are useful stress shapes.

Usage: python3 tools/make_sf1.py [--perturb] [--factor N] [src_dir] [dst_dir]
       (defaults: /root/testdata/sf0.1 -> ./benchdata-sf1, factor 10;
        --factor 100 from sf0.1 gives an sf10-equivalent 100x stress set)
"""
import sys
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

argv = sys.argv[1:]
COPIES = 10
if "--factor" in argv:
    i = argv.index("--factor")
    COPIES = int(argv[i + 1])
    argv = argv[:i] + argv[i + 2:]
args = [a for a in argv if a != "--perturb"]
PERTURB = "--perturb" in argv
SRC = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
DST = args[1] if len(args) > 1 else "benchdata-sf1"


def perturb_text(text: str, i: int) -> str:
    if i == 0:
        return text
    toks = text.split(" ")
    out = []
    for j, t in enumerate(toks):
        if j % 5 == 0:
            out.append(f"c{i}v{j % 7}")
        out.append(t)
    return " ".join(out)


def perturb_columns(name: str, i: int, t: pa.Table) -> pa.Table:
    if not PERTURB or i == 0:
        return t
    if name == "documents":
        texts = [perturb_text(v.as_py(), i) for v in t["text"]]
        t = t.set_column(t.schema.get_field_index("text"), "text",
                         pa.array(texts, type=pa.string()))
    elif name == "embeddings":
        # cyclic coordinate shift per copy: preserves every norm and every
        # WITHIN-copy inner product exactly (each copy has the original
        # similarity structure), while cross-copy cosines become ~random —
        # no artificial near-duplicate cliques (a magnitude bump on one
        # coordinate created near-parallel vectors and blew up the ANN
        # queries with real-but-synthetic near-dup work)
        vecs = []
        for v in t["embedding"]:
            vec = v.as_py()
            s = (7 * i) % len(vec)
            vec = vec[s:] + vec[:s]
            # beyond len(vec) copies the shift cycles back (7*64 ≡ 0 mod
            # 64) — add a per-cycle sign-flip pattern, which also
            # preserves every norm and within-copy inner product
            # (<s⊙a, s⊙b> = Σ s_k² a_k b_k = <a,b>) while decorrelating
            # the repeated-shift copies
            if (i // len(vec)) % 2 == 1:
                vec = [-x if k % 2 == 1 else x for k, x in enumerate(vec)]
            vecs.append(vec)
        t = t.set_column(t.schema.get_field_index("embedding"), "embedding",
                         pa.array(vecs, type=t.schema.field("embedding").type))
    elif name in ("supplier", "customer"):
        col = "s_acctbal" if name == "supplier" else "c_acctbal"
        idx = t.schema.get_field_index(col)
        t = t.set_column(idx, col, pc.add(t[col], pa.scalar(i * 11000.0)))
    return t

# table -> {column: key_family}; every column of one family shifts together
KEYS = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
DIMS = ["nation", "region"]


def main():
    import os
    os.makedirs(DST, exist_ok=True)
    # key-family strides from the max over every column in the family
    stride = {}
    tables = {}
    for name, cols in KEYS.items():
        t = pq.read_table(f"{SRC}/{name}.parquet")
        tables[name] = t
        for col, fam in cols.items():
            m = pc.max(t[col]).as_py()
            stride[fam] = max(stride.get(fam, 0), m + 1)
    for name in DIMS:
        pq.read_table(f"{SRC}/{name}.parquet")  # validate presence
        import shutil
        shutil.copyfile(f"{SRC}/{name}.parquet", f"{DST}/{name}.parquet")
    for name, cols in KEYS.items():
        t = tables[name]
        copies = []
        for i in range(COPIES):
            ti = perturb_columns(name, i, t)
            arrays = []
            for field in ti.schema:
                col = ti[field.name]
                fam = cols.get(field.name)
                if fam is not None and i > 0:
                    off = pa.scalar(i * stride[fam], type=field.type)
                    col = pc.add(col, off)
                arrays.append(col)
            copies.append(pa.table(arrays, schema=ti.schema))
        out = pa.concat_tables(copies)
        pq.write_table(out, f"{DST}/{name}.parquet")
        print(f"{name}: {t.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    main()
