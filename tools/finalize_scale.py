"""Convert graft.ScaleData output (a directory of part files per table)
into the driver's testdata layout (ONE parquet FILE per table, events.ts
restored to timestamp[ns]) so tools/oracle_check.py and exact_diff.py
run against scaled corpora unchanged.

Usage: python3 tools/finalize_scale.py /tmp/sf1 /tmp/sf1f
"""
import sys, os, glob
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.dataset as ds

src, dst = sys.argv[1], sys.argv[2]
os.makedirs(dst, exist_ok=True)
for d in sorted(glob.glob(f"{src}/*.parquet")):
    name = os.path.basename(d)[: -len(".parquet")]
    t = ds.dataset(d, format="parquet").to_table()
    if name == "events":
        # Spark wrote the nanos as plain INT64 (it reads ns-parquet via
        # nanosAsLong); restore the driver's physical type so DuckDB sees
        # TIMESTAMP_NS again and the timestamp-literal oracles parse.
        i = t.schema.get_field_index("ts")
        ns = t.column(i).cast(pa.timestamp("ns"))
        t = t.set_column(i, pa.field("ts", pa.timestamp("ns")), ns)
    pq.write_table(t, f"{dst}/{name}.parquet", version="2.6",
                   coerce_timestamps=None)
    print(f"[finalize] {name}: {t.num_rows} rows")
