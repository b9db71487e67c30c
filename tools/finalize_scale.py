"""Convert graft.ScaleData output (a directory of part files per table)
into the driver's testdata layout (ONE parquet FILE per table) so
tools/oracle_check.py and exact_diff.py run against scaled corpora
unchanged.

events.ts handling tracks the DRIVER corpus convention:
- modern corpus (r05+): timestamp[us] (TIMESTAMP_NTZ in Spark) — keep
  as-is. Do NOT up-convert to timestamp[ns]: pyarrow preserves the
  source files' embedded `org.apache.spark.sql.parquet.row.metadata`
  key, which then claims timestamp_ntz over a NANOS column — Spark
  trusts the embedded schema at inference and the vectorized reader
  dies on the nanos data (the r05-r06 sf1f corpora shipped exactly
  this; caught by the r07 sweep). The engine side survives it now via
  EventTime.readAdaptive + DataContract's read probe, but emitting a
  self-consistent file is still the right thing.
- legacy ns-as-long corpus: Spark wrote the nanos back as PLAIN INT64
  (no logical type); restore TIMESTAMP_NS so DuckDB's timestamp-literal
  oracles parse. Only this int64 case is converted.

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
        i = t.schema.get_field_index("ts")
        if pa.types.is_int64(t.schema.field(i).type):
            # legacy ns-as-long layout only (see module docstring)
            ns = t.column(i).cast(pa.timestamp("ns"))
            t = t.set_column(i, pa.field("ts", pa.timestamp("ns")), ns)
    pq.write_table(t, f"{dst}/{name}.parquet", version="2.6",
                   coerce_timestamps=None)
    print(f"[finalize] {name}: {t.num_rows} rows")
