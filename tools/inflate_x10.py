"""Deterministic x10 fixture generator (the round-10 decade-up ritual,
now committed — r10 VERDICT residual — and extended to the corpus side).

Inflates /root/testdata/sf0.1 by 10x into a target directory:

Relational surface (sf1 density, the documented r10 salts):
  * events    : replica k gets event_id + k*1e8, user_id + k*1500 so
                events/user stays ~67 and no replica shares a user.
  * customer  : c_custkey + k*15000; c_name regenerated from the new
                key; c_acctbal jittered per (row, k) by a deterministic
                +/- <=0.50 cents-exact shift so linkage blocking bands
                stay realistically occupied instead of producing 10
                exact copies of every balance.
  * orders    : o_orderkey + k*150000, o_custkey + k*15000.
  * lineitem  : l_orderkey + k*150000; suppliers/parts passthrough
                (dims are not inflated, mirroring a real scale-up where
                dimensions grow far slower than facts).
  * region / nation / supplier / part: passthrough copies.

Corpus surface (NEW in round 11 — the r10 probe left documents and
embeddings passthrough):
  * documents : replica k gets doc_id + k*100000. For k > 0, every
                token at position p with p % 4 == (k-1) % 4 gets the
                suffix "~k". The rule is uniform within a replica, so
                engineered near-duplicate families survive inflation
                with their within-replica similarity roughly intact,
                while ANY 8-token shingle spans all four residues
                mod 4 and therefore differs across replicas — so the
                number of near-dup clusters grows ~10x but cluster
                SIZES stay constant (the realistic scale-up; naive
                verbatim replication would instead grow every cluster
                10x and blow quadratic pair stages). n_chars is
                recomputed from the perturbed text.
  * embeddings: replica k gets vec_id + k*100000 and the embedding
                cyclically rolled by k dimensions. Rolling preserves
                norms and all within-replica inner products exactly
                (each replica is an isometric copy of the original
                geometry) while decorrelating replicas — local ANN
                structure x10, no artificial cross-replica neighbors.

Everything is pure arithmetic on the source rows — no RNG — so two
runs produce byte-identical fixtures.

Usage: python tools/inflate_x10.py [SRC_SF_DIR] [DEST_DIR] [FACTOR]
Defaults: /root/testdata/sf0.1 /tmp/sfx1 10
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

PASSTHROUGH = ("region", "nation", "supplier", "part")


def inflate_relational(con, src: str, dest: str, factor: int) -> None:
    reps = f"(SELECT UNNEST(RANGE({factor})) AS k)"
    sql = {
        "events": f"""
            SELECT e.event_id + r.k * 100000000 AS event_id,
                   e.ts,
                   e.user_id + r.k * 1500 AS user_id,
                   e.event_type,
                   e.value,
                   e.props
            FROM read_parquet('{src}/events.parquet') e CROSS JOIN {reps} r
        """,
        "customer": f"""
            SELECT c.c_custkey + r.k * 15000 AS c_custkey,
                   'Customer#' || lpad(CAST(c.c_custkey + r.k * 15000
                                            AS VARCHAR), 9, '0') AS c_name,
                   c.c_nationkey,
                   ROUND(c.c_acctbal
                         + ((c.c_custkey * 7 + r.k * 13) % 101 - 50)
                           / 100.0, 2) AS c_acctbal,
                   c.c_mktsegment
            FROM read_parquet('{src}/customer.parquet') c CROSS JOIN {reps} r
        """,
        "orders": f"""
            SELECT o.o_orderkey + r.k * 150000 AS o_orderkey,
                   o.o_custkey + r.k * 15000 AS o_custkey,
                   o.* EXCLUDE (o_orderkey, o_custkey)
            FROM read_parquet('{src}/orders.parquet') o CROSS JOIN {reps} r
        """,
        "lineitem": f"""
            SELECT l.l_orderkey + r.k * 150000 AS l_orderkey,
                   l.* EXCLUDE (l_orderkey)
            FROM read_parquet('{src}/lineitem.parquet') l CROSS JOIN {reps} r
        """,
    }
    for table, q in sql.items():
        con.execute(
            f"COPY ({q}) TO '{dest}/{table}.parquet' (FORMAT PARQUET)"
        )
        print(f"  {table}: x{factor} written")
    for table in PASSTHROUGH:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{table}.parquet')) "
            f"TO '{dest}/{table}.parquet' (FORMAT PARQUET)"
        )
    print(f"  dims passthrough: {', '.join(PASSTHROUGH)}")


def _perturb_text(text: str, k: int) -> str:
    if k == 0:
        return text
    res = (k - 1) % 4
    toks = text.split(" ")
    return " ".join(
        f"{t}~{k}" if p % 4 == res and t else t for p, t in enumerate(toks)
    )


def inflate_documents(src: str, dest: str, factor: int) -> None:
    base = pd.read_parquet(f"{src}/documents.parquet")
    out = []
    for k in range(factor):
        rep = base.copy()
        rep["doc_id"] = rep["doc_id"] + k * 100000
        if k > 0:
            rep["text"] = [_perturb_text(t, k) for t in rep["text"]]
        rep["n_chars"] = rep["text"].str.len().astype("int64")
        out.append(rep)
    pd.concat(out, ignore_index=True).to_parquet(
        f"{dest}/documents.parquet", index=False
    )
    print(f"  documents: x{factor} written (token-salt residue rule)")


def inflate_embeddings(src: str, dest: str, factor: int) -> None:
    base = pd.read_parquet(f"{src}/embeddings.parquet")
    mat = np.stack(base["embedding"].to_numpy())
    out = []
    for k in range(factor):
        rep = base.copy()
        rep["vec_id"] = rep["vec_id"] + k * 100000
        rolled = np.roll(mat, k, axis=1)
        rep["embedding"] = [row for row in rolled]
        out.append(rep)
    pd.concat(out, ignore_index=True).to_parquet(
        f"{dest}/embeddings.parquet", index=False
    )
    print(f"  embeddings: x{factor} written (per-replica dimension roll)")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dest = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfx1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dest, exist_ok=True)
    con = duckdb.connect()
    print(f"inflating {src} -> {dest} (x{factor})")
    inflate_relational(con, src, dest, factor)
    inflate_documents(src, dest, factor)
    inflate_embeddings(src, dest, factor)
    con.close()
    for t in (*PASSTHROUGH, "customer", "orders", "lineitem", "events",
              "documents", "embeddings"):
        n = duckdb.sql(
            f"SELECT COUNT(*) FROM read_parquet('{dest}/{t}.parquet')"
        ).fetchone()[0]
        print(f"  {t}: {n} rows")


if __name__ == "__main__":
    main()
