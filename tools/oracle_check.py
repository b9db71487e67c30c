import duckdb, json, glob, os, sys
sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.001'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    p = f'{sf}/{t}.parquet'
    if os.path.isdir(p):  # raw Spark dir layout (e.g. /tmp/sf3): glob the parts
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
    elif os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
oracle = json.load(open(f'{out}/oracle_sql.json'))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetchdf()
        got = con.execute(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").fetchdf()
        # driver-style: sort columns by name, compare values
        exp = exp[sorted(exp.columns)]
        got = got[sorted(got.columns)]
        if list(exp.columns) != list(got.columns):
            print(f'FAIL {name}: columns {list(exp.columns)} vs {list(got.columns)}'); fails += 1; continue
        exp2 = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
        got2 = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        if len(exp2) != len(got2):
            print(f'FAIL {name}: rows {len(exp2)} vs {len(got2)}'); fails += 1; continue
        eq = exp2.equals(got2)
        if not eq:
            diff = (exp2 != got2) & ~(exp2.isna() & got2.isna())
            bad = diff.any(axis=1)
            print(f'FAIL {name}: value mismatch, {bad.sum()} rows; dtypes exp={dict(exp2.dtypes)} got={dict(got2.dtypes)}')
            print(exp2[bad].head(3)); print(got2[bad].head(3)); fails += 1
        else:
            print(f'OK   {name} ({len(exp2)} rows)')
    except Exception as e:
        print(f'ERR  {name}: {e}'); fails += 1
sys.exit(1 if fails else 0)
