#!/usr/bin/env python3
"""Synthesize LOSSLESS variant-dtype encodings of the sf0.001 harness
tables — the dtype-drift insurance fixtures (the round-6 NTZ episode
generalized: every physical encoding the generator could plausibly ship
must flow through the loaders unchanged in VALUE).

Six variants, each a full table set:

  narrow   every int64 column whose values fit → int32
  wide     every int32 column → int64; string → large_string;
           list<float> embeddings → list<double>;
           naked timestamp[us] → timestamp[ns] (Spark 4 reads these only
           via the nanosAsLong escape hatch — the exact round-6 trap)
  zoned    naked timestamp[us] → timestamp[us, tz=UTC]
  decimal  money columns (l_extendedprice, o_totalprice — verified exact
           2dp in the source) double → decimal128(18,2)
  date32   midnight-only date-semantic timestamps (l_shipdate,
           o_orderdate — verified all-midnight) → date32
  required every column with zero nulls flipped optional → required
           (nullable=False) in the parquet schema

All conversions are value-preserving, so any query result on a variant
dir must equal the result on the base dir (modulo output integer WIDTH,
which follows the inputs by design — both engines read the same file).

Usage: python3 tools/make_variants.py [src_dir] [dst_root]
       (defaults: /root/testdata/sf0.001 -> src/test/resources/graft/variants)
"""
import sys, os, glob
import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
DST = sys.argv[2] if len(sys.argv) > 2 else "src/test/resources/graft/variants"


def convert_col(col: pa.ChunkedArray, f: pa.Field, variant: str):
    t = f.type
    if variant == "narrow":
        if pa.types.is_int64(t):
            # lossless only: skip columns with values outside int32
            import pyarrow.compute as pc
            mn, mx = pc.min(col).as_py(), pc.max(col).as_py()
            if mn is not None and -2**31 <= mn and mx < 2**31:
                return col.cast(pa.int32())
        return col
    if variant == "wide":
        if pa.types.is_int32(t):
            return col.cast(pa.int64())
        if pa.types.is_string(t):
            return col.cast(pa.large_string())
        if pa.types.is_list(t) and pa.types.is_float32(t.value_type):
            return col.cast(pa.list_(pa.float64()))
        if pa.types.is_timestamp(t) and t.tz is None:
            return col.cast(pa.timestamp("ns"))
        return col
    if variant == "zoned":
        if pa.types.is_timestamp(t) and t.tz is None:
            return col.cast(pa.timestamp(t.unit, tz="UTC"))
        return col
    if variant == "decimal":
        if f.name in ("l_extendedprice", "o_totalprice"):
            return col.cast(pa.decimal128(18, 2))
        return col
    if variant == "date32":
        if f.name in ("l_shipdate", "o_orderdate"):
            return col.cast(pa.date32())
        return col
    if variant == "required":
        return col  # schema-level change, handled below
    raise ValueError(variant)


for variant in ("narrow", "wide", "zoned", "decimal", "date32", "required"):
    outdir = os.path.join(DST, variant)
    os.makedirs(outdir, exist_ok=True)
    for p in sorted(glob.glob(f"{SRC}/*.parquet")):
        tbl = pq.read_table(p)
        cols = [convert_col(tbl.column(i), tbl.schema.field(i), variant)
                for i in range(tbl.num_columns)]
        if variant == "required":
            fields = [pa.field(tbl.schema.field(i).name, cols[i].type,
                               nullable=cols[i].null_count > 0)
                      for i in range(tbl.num_columns)]
            out = pa.Table.from_arrays(
                [c.combine_chunks() for c in cols], schema=pa.schema(fields))
        else:
            out = pa.table(
                {tbl.schema.field(i).name: cols[i]
                 for i in range(tbl.num_columns)})
        pq.write_table(out, os.path.join(outdir, os.path.basename(p)),
                       version="2.6", compression="zstd")
    print(f"{variant}: {len(glob.glob(f'{outdir}/*.parquet'))} tables")
