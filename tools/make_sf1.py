#!/usr/bin/env python3
"""Synthesize an sf1-equivalent dataset (10x sf0.1) for builder-side
scale-stress benching.

Fact tables are replicated 10x with consistent key offsets (copy i shifts
each key family by i * (max_key + 1), so intra-copy join relationships are
preserved and copies never collide); the nation/region dims stay fixed,
like TPC-H scaling. All physical types are preserved via pyarrow (the
events table's timestamp[ns] column must survive the copy — the Spark-side
reader depends on it).

Usage: python3 tools/make_sf1.py [src_dir] [dst_dir]
       (defaults: /root/testdata/sf0.1 -> ./benchdata-sf1)
"""
import sys
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "benchdata-sf1"
COPIES = 10

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
            arrays = []
            for field in t.schema:
                col = t[field.name]
                fam = cols.get(field.name)
                if fam is not None and i > 0:
                    off = pa.scalar(i * stride[fam], type=field.type)
                    col = pc.add(col, off)
                arrays.append(col)
            copies.append(pa.table(arrays, schema=t.schema))
        out = pa.concat_tables(copies)
        pq.write_table(out, f"{DST}/{name}.parquet")
        print(f"{name}: {t.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    main()
