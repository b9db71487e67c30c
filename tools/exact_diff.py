"""Bit-exact column diff between a Verify parquet dump and the DuckDB oracle.

Unlike oracle_check.py (pandas fetchdf, which coerces DECIMAL->float64 and
hides sub-ulp divergence), this compares exact values: pyarrow for the Spark
side, duckdb fetchall (python Decimal / datetime) for the oracle side.
Doubles are compared by struct-packed bits; decimals as exact Decimal.

Usage: python3 tools/exact_diff.py <sfDir> <verifyOut> [query ...]
"""
import duckdb, json, os, struct, sys
import pyarrow.parquet as pq

sf = sys.argv[1]
out = sys.argv[2]
names = sys.argv[3:]

con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']:
    p = f'{sf}/{t}.parquet'
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f'{out}/oracle_sql.json'))
if not names:
    names = sorted(oracle)

def canon(v):
    if isinstance(v, float):
        return ('f64', struct.pack('<d', v).hex())
    return (type(v).__name__, repr(v))

fails = 0
for name in names:
    sql = oracle.get(name)
    if sql is None:
        print(f'SKIP {name}: no oracle'); continue
    cur = con.execute(sql)
    exp_cols = [d[0] for d in cur.description]
    exp_rows = cur.fetchall()
    tbl = pq.read_table(f'{out}/{name}')
    got_cols = tbl.column_names
    if sorted(exp_cols) != sorted(got_cols):
        print(f'FAIL {name}: columns {sorted(exp_cols)} vs {sorted(got_cols)}')
        fails += 1; continue
    order = sorted(exp_cols)
    exp = sorted([tuple(r[exp_cols.index(c)] for c in order) for r in exp_rows],
                 key=lambda r: tuple(str(x) for x in r))
    gpy = tbl.to_pydict()
    got = sorted([tuple(gpy[c][i] for c in order) for i in range(tbl.num_rows)],
                 key=lambda r: tuple(str(x) for x in r))
    if len(exp) != len(got):
        print(f'FAIL {name}: rows {len(exp)} vs {len(got)}'); fails += 1; continue
    bad = 0
    for i, (e, g) in enumerate(zip(exp, got)):
        for j, c in enumerate(order):
            ce, cg = canon(e[j]), canon(g[j])
            if ce != cg:
                if bad < 8:
                    print(f'DIFF {name} row {i} col {c}: oracle={e[j]!r} {ce} spark={g[j]!r} {cg}')
                bad += 1
    if bad:
        print(f'FAIL {name}: {bad} cell diffs'); fails += 1
    else:
        print(f'OK   {name} ({len(exp)} rows exact)')
sys.exit(1 if fails else 0)
