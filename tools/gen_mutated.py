#!/usr/bin/env python3
"""Derive a GENUINE-near-dup stress corpus from a driver SF dir.

The key-shifted scale copies (gen_sf1.py) replicate text VERBATIM, so
every dedup recall measurement there is over identical twins — the
signatures collide trivially and recall floors are geometry-
independent (SURVEY §6 admits this). This generator replicates
documents with TOKEN-LEVEL EDITS at controlled rates and embeddings
with controlled angular noise, so candidate-generation recall is
earned on pairs that are genuinely NEAR, not equal:

 - documents: copy 0 is the original; copy k >= 1 mutates each token
   with probability RATES[(k-1) % len(RATES)] (default 2% / 5% / 10%,
   cycling) — substitution, deletion, or duplication chosen per site,
   all seeded by (doc_id, copy, position): deterministic, re-runnable.
   At 3-gram shingling the expected surviving-shingle fraction is
   ~(1-r)^3 ≈ 0.94 / 0.86 / 0.73, so the exact-pair truth set spans
   the j∈[0.7, 1) band where banded MinHash recall actually varies.
 - embeddings: copy k >= 1 adds seeded gaussian noise sized so the
   expected cosine to the original is ~COS[(k-1) % len(COS)]
   (default 0.98 / 0.95 / 0.90).
 - every other table is copied key-shifted (same as gen_sf1.py) so the
   dir remains a complete SF dir for any probe or bench.

Usage: gen_mutated.py DST [SRC] [COPIES] [OFF]
Defaults: target/sfmut /root/testdata/sf0.1 10 10000000
"""
import hashlib
import math
import os
import sys

import duckdb
import numpy as np
import pandas as pd

DST = sys.argv[1] if len(sys.argv) > 1 else 'target/sfmut'
SRC = sys.argv[2] if len(sys.argv) > 2 else '/root/testdata/sf0.1'
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10
OFF = int(sys.argv[4]) if len(sys.argv) > 4 else 10_000_000
RATES = [0.02, 0.05, 0.10]
COS = [0.98, 0.95, 0.90]

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()


def rng_for(doc_id: int, copy: int) -> np.random.RandomState:
    h = hashlib.md5(f"{doc_id}|{copy}".encode()).digest()
    return np.random.RandomState(int.from_bytes(h[:4], 'big'))


def mutate_text(text: str, rate: float, rng: np.random.RandomState) -> str:
    toks = text.split()
    out = []
    for i, t in enumerate(toks):
        if rng.random_sample() < rate:
            op = rng.randint(3)
            if op == 0:
                out.append(f"mut{rng.randint(100000)}")  # substitute
            elif op == 1:
                pass                                     # delete
            else:
                out.extend([t, t])                       # duplicate
        else:
            out.append(t)
    return ' '.join(out)


def gen_documents():
    src = con.execute(
        f"SELECT * FROM read_parquet('{SRC}/documents.parquet') ORDER BY doc_id"
    ).fetchdf()
    parts = [src]
    for k in range(1, COPIES):
        rate = RATES[(k - 1) % len(RATES)]
        c = src.copy()
        c['text'] = [mutate_text(t, rate, rng_for(d, k))
                     for d, t in zip(src['doc_id'], src['text'])]
        c['doc_id'] = src['doc_id'] + k * OFF
        c['n_chars'] = c['text'].str.len().astype('int64')
        parts.append(c)
    allp = pd.concat(parts, ignore_index=True)
    con.register('docs_mut', allp)
    con.execute(
        f"COPY (SELECT * FROM docs_mut) TO '{DST}/documents.parquet' (FORMAT PARQUET)")
    print('documents', len(allp))


def gen_embeddings():
    src = con.execute(
        f"SELECT * FROM read_parquet('{SRC}/embeddings.parquet') ORDER BY vec_id"
    ).fetchdf()
    dim = len(src['embedding'].iloc[0])
    parts = [src]
    for k in range(1, COPIES):
        target_cos = COS[(k - 1) % len(COS)]
        # unit noise orthogonalized against v gives cos = 1/sqrt(1+s^2)
        # for v' = v_hat + s*n_hat  ->  s = tan(arccos(target))
        s = math.tan(math.acos(target_cos))
        c = src.copy()
        new = []
        for vid, v in zip(src['vec_id'], src['embedding']):
            v = np.asarray(v, dtype=np.float64)
            nrm = np.linalg.norm(v)
            vh = v / (nrm if nrm > 0 else 1.0)
            rng = rng_for(int(vid), 1000 + k)
            n = rng.standard_normal(dim)
            n -= n.dot(vh) * vh
            nn = np.linalg.norm(n)
            nh = n / (nn if nn > 0 else 1.0)
            new.append(((vh + s * nh) * nrm).astype(np.float32))
        c['embedding'] = new
        c['vec_id'] = src['vec_id'] + k * OFF
        parts.append(c)
    allp = pd.concat(parts, ignore_index=True)
    con.register('emb_mut', allp)
    con.execute(
        f"COPY (SELECT vec_id, embedding::FLOAT[] AS embedding, label "
        f"FROM emb_mut) TO '{DST}/embeddings.parquet' (FORMAT PARQUET)")
    print('embeddings', len(allp))


def gen_shifted(table, keyed_cols):
    src = f"read_parquet('{SRC}/{table}.parquet')"
    cols = [c[0] for c in con.execute(f'DESCRIBE SELECT * FROM {src}').fetchall()]
    parts = []
    for k in range(COPIES):
        sel = ', '.join(
            f'{c} + {k * OFF} AS {c}' if c in keyed_cols else c for c in cols)
        parts.append(f'SELECT {sel} FROM {src}')
    con.execute(f"COPY ({' UNION ALL '.join(parts)}) TO "
                f"'{DST}/{table}.parquet' (FORMAT PARQUET)")
    print(table, 'shifted x', COPIES)


for t in ('region', 'nation'):
    con.execute(f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
                f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    print(t, 'copied')
gen_shifted('customer', {'c_custkey'})
gen_shifted('supplier', {'s_suppkey'})
gen_shifted('part', {'p_partkey'})
gen_shifted('orders', {'o_orderkey', 'o_custkey'})
gen_shifted('lineitem', {'l_orderkey', 'l_partkey', 'l_suppkey'})
gen_shifted('events', {'event_id', 'user_id'})
gen_documents()
gen_embeddings()
