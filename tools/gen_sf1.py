#!/usr/bin/env python3
"""Derive a 10x scale stress copy (sf1) from the driver-generated sf0.1:
each copy k shifts every entity/fact key by k*OFF so FKs stay valid;
dimension tables (region, nation) and non-key payloads are unchanged.
Documents/embeddings replicate verbatim -> 10-way duplicate groups, a
deliberate stress for the dedup operators. Output: target/sf1/."""
import duckdb, os, sys

# args: [DST] [SRC] [COPIES] [OFF] — defaults reproduce the original
# sf1 derivation; `gen_sf10.sh`-style use: target/sf10 target/sf1 10 100000000
SRC = sys.argv[2] if len(sys.argv) > 2 else '/root/testdata/sf0.1'
DST = sys.argv[1] if len(sys.argv) > 1 else 'target/sf1'
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10
OFF = int(sys.argv[4]) if len(sys.argv) > 4 else 10_000_000
os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

def gen(table, keyed_cols, transforms=None):
    src = f"read_parquet('{SRC}/{table}.parquet')"
    cols = [c[0] for c in con.execute(f'DESCRIBE SELECT * FROM {src}').fetchall()]
    parts = []
    for k in range(COPIES):
        sel = ', '.join(
            f'{c} + {k*OFF} AS {c}' if c in keyed_cols
            else f'{(transforms or {}).get(c)} AS {c}' if transforms and c in transforms
            else c for c in cols)
        parts.append(f'SELECT {sel} FROM {src}')
    q = ' UNION ALL '.join(parts)
    con.execute(f"COPY ({q}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{table}.parquet')").fetchone()[0]
    print(table, n)

for t in ('region', 'nation'):
    con.execute(f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    print(t, 'copied')
gen('customer', {'c_custkey'})
gen('supplier', {'s_suppkey'})
gen('part', {'p_partkey'})
gen('orders', {'o_orderkey', 'o_custkey'})
gen('lineitem', {'l_orderkey', 'l_partkey', 'l_suppkey'})
# events.ts is physically timestamp[us] in the current testdata
# generation; DuckDB preserves it on COPY, and Tables.normalizeEventTs
# dispatches on the read schema either way (NTZ here, or INT64 nanos
# from the older generation).
gen('events', {'event_id', 'user_id'})
gen('documents', {'doc_id'})
gen('embeddings', {'vec_id'})
