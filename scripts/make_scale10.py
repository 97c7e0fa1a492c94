#!/usr/bin/env python3
"""Derived 10x scale step for BENCH MEASUREMENT ONLY (never a
correctness input): /root/testdata has no sf1, so the data-scaling
exponent asked for by VERDICT r7 task 7 is measured on a replica-
constructed sf1 written to target/sf1 (inside the repo; testdata is
read-only and stays untouched).

Construction preserves the workload's *density* characteristics so the
measurement is meaningful, instead of inflating it with artificial
cross-replica duplicates:
  * documents/part text: per-replica alphabet ROTATION (translate) —
    token counts, word lengths and char distributions survive, but
    cross-replica shingle/levenshtein overlap collapses, so dup and
    match density per corpus stays what sf0.1 had (10 identical copies
    of every doc would instead add 45 bogus near-dup pairs each).
    CAVEAT (ADVICE r8): the rotation touches [a-z] only — digit-only
    or otherwise non-alphabetic documents stay byte-identical across
    replicas and add exact cross-replica duplicates, so measured dedup
    pair counts on this corpus are a mild OVER-estimate of the
    density-preserved ideal. Bench-only input, so no correctness
    impact; kept as-is so recorded round-8 measurements in SCALE.md /
    BASELINE.md stay reproducible against the same bytes.
  * embeddings: per-replica SIGNED PERMUTATION of dimensions — an
    orthogonal transform, so all pairwise cosines WITHIN a replica are
    bit-preserved (per-shard workload identical to sf0.1) while
    cross-replica cosines are ~0 (no bogus ANN neighbors).
  * keys (doc_id / vec_id / event_id / user_id / p_partkey): shifted
    by replica * 10^9 to stay unique.

Usage: python3 scripts/make_scale10.py [outDir] (default target/sf1)
"""
import os, random, sys
import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "target/sf1"
REPS = 10
SHIFT = 10 ** 9
os.makedirs(OUT, exist_ok=True)

AL = "abcdefghijklmnopqrstuvwxyz"


def rot(r):
    """Alphabet rotated by r (identity for replica 0)."""
    k = r % 26
    low = AL[k:] + AL[:k]
    return AL + AL.upper(), low + low.upper()


con = duckdb.connect()


def replicate(table, select_fn):
    parts = [select_fn(r) for r in range(REPS)]
    sql = " UNION ALL ".join(parts)
    con.execute(
        f"COPY ({sql}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{OUT}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")


def docs_select(r):
    src, dst = rot(r)
    return (f"SELECT doc_id + {r * SHIFT} AS doc_id, "
            f"translate(text, '{src}', '{dst}') AS text, lang, source, "
            f"n_chars FROM '{SRC}/documents.parquet'")


def emb_select(r):
    perm = list(range(64))
    signs = [1] * 64
    if r > 0:
        rng_r = random.Random(1000 + r)
        rng_r.shuffle(perm)
        signs = [rng_r.choice((-1, 1)) for _ in range(64)]
    terms = ", ".join(f"{signs[i]}*embedding[{perm[i] + 1}]"
                      for i in range(64))
    return (f"SELECT vec_id + {r * SHIFT} AS vec_id, "
            f"CAST([{terms}] AS FLOAT[]) AS embedding, label "
            f"FROM '{SRC}/embeddings.parquet'")


def events_select(r):
    return (f"SELECT event_id + {r * SHIFT} AS event_id, ts, "
            f"user_id + {r * SHIFT} AS user_id, event_type, value, props "
            f"FROM '{SRC}/events.parquet'")


def part_select(r):
    src, dst = rot(r)
    return (f"SELECT p_partkey + {r * SHIFT} AS p_partkey, "
            f"translate(p_name, '{src}', '{dst}') AS p_name, "
            f"p_brand, p_type, p_size, p_retailprice "
            f"FROM '{SRC}/part.parquet'")


replicate("documents", docs_select)
replicate("embeddings", emb_select)
replicate("events", events_select)
replicate("part", part_select)

# The remaining tables are not touched by the slow-query spot set; link
# the sf0.1 originals so Tables.* readers that eagerly resolve paths
# still find them.
for t in ["region", "nation", "customer", "supplier", "orders",
          "lineitem"]:
    dst = f"{OUT}/{t}.parquet"
    if not os.path.exists(dst):
        os.symlink(f"{SRC}/{t}.parquet", dst)
print("done ->", OUT)
