#!/usr/bin/env python
"""Generate a 10x scale point (sf1-equivalent) from the sf0.1 testdata.

The driver testdata stops at sf0.1; plan audits can't catch runtime
scale cliffs (state growth, band skew, quadratic candidate blowups), so
this builds a 10x dataset under a writable directory by replicating the
sf0.1 tables with key offsets:

* fact tables (lineitem, orders, events, documents, embeddings) scale
  10x with offset primary keys — orders/lineitem keep their customer /
  supplier / part foreign keys so each dimension row serves 10x the
  facts, which is exactly how a real 10x scale-up loads the join graph;
* events replicas shift timestamps by +36 days each so session/window
  state grows with data instead of stacking identical instants;
* document replicas get a one-token suffix so near-dup candidates grow
  realistically instead of everything collapsing into one dup cluster;
* dimension tables (region, nation, customer, supplier, part) copy
  unchanged.

Usage: python tools/make_scale_data.py [src_dir] [dst_dir] [factor] [tables] [mutation]
Defaults: /root/testdata/sf0.1 -> /tmp/scale_sf1, factor 10, all tables,
mutation=narrow.
``tables`` is a comma-separated fact-table subset (dims always copy) —
used for the 100x second-decade point, where only the adaptive-knob
operators' tables (documents, embeddings, events) are needed and a
100x lineitem would be pure disk cost.
``mutation`` controls the document replica edit: ``narrow`` appends one
replica token (every replica stays a near-dup of every other — right
for 10x, where families of 10 mutual near-dups are plausible);
``wide`` appends five (replica-vs-ORIGINAL jaccard stays over the 0.8
dedup threshold but replica-vs-replica falls under it, so families are
STARS and verified-pair counts grow linearly with the factor — a 100x
corpus models a constant duplication RATE, not 100-deep duplication of
every document).
"""

from __future__ import annotations

import os
import sys

import duckdb

DIMS = ("region", "nation", "customer", "supplier", "part")
FACTS = ("orders", "lineitem", "events", "documents", "embeddings")


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    wanted = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else set(FACTS)
    mutation = sys.argv[5] if len(sys.argv) > 5 else "narrow"
    assert mutation in ("narrow", "wide"), mutation
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def gen(table: str, sql_per_replica: str) -> None:
        if table not in wanted:
            return
        parts = " UNION ALL ".join(
            sql_per_replica.format(r=r, src=f"'{src}/{table}.parquet'")
            for r in range(factor)
        )
        con.sql(f"COPY ({parts}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM read_parquet('{dst}/{table}.parquet')").fetchone()[0]
        print(f"{table}: {n} rows")

    for d in DIMS:
        con.sql(
            f"COPY (SELECT * FROM read_parquet('{src}/{d}.parquet')) "
            f"TO '{dst}/{d}.parquet' (FORMAT PARQUET)"
        )
        print(f"{d}: copied")

    def span(table: str, key: str) -> int:
        return con.sql(
            f"SELECT max({key}) + 1 FROM read_parquet('{src}/{table}.parquet')"
        ).fetchone()[0]

    okey = span("orders", "o_orderkey")
    gen(
        "orders",
        "SELECT * REPLACE (o_orderkey + {r} * " + str(okey) + " AS o_orderkey) "
        "FROM read_parquet({src})",
    )
    gen(
        "lineitem",
        "SELECT * REPLACE (l_orderkey + {r} * " + str(okey) + " AS l_orderkey) "
        "FROM read_parquet({src})",
    )
    ev = span("events", "event_id")
    gen(
        "events",
        "SELECT * REPLACE (event_id + {r} * " + str(ev) + " AS event_id, "
        "ts + INTERVAL ({r} * 36) DAY AS ts) FROM read_parquet({src})",
    )
    doc = span("documents", "doc_id")
    suffix = " r{r}" if mutation == "narrow" else " r{r} s{r} t{r} u{r} v{r}"
    gen(
        "documents",
        "SELECT * REPLACE (doc_id + {r} * " + str(doc) + " AS doc_id, "
        f"CASE WHEN {{r}} = 0 THEN text ELSE text || '{suffix}' END AS text, "
        f"n_chars + CASE WHEN {{r}} = 0 THEN 0 ELSE length('{suffix}') END AS n_chars) "
        "FROM read_parquet({src})",
    )
    vec = span("embeddings", "vec_id")
    gen(
        "embeddings",
        "SELECT * REPLACE (vec_id + {r} * " + str(vec) + " AS vec_id) "
        "FROM read_parquet({src})",
    )
    print(f"wrote {dst} at {factor}x {src}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
