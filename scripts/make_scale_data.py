"""Scale-up replicator for the BASELINE.md scaling curve (round-2
VERDICT item 3: measure the sweep at sf1).

The driver ships deterministic testdata at sf0.001/0.01/0.1 only; this
script builds an sfN-equivalent volume by replicating sf0.1 K times
with consistent per-copy key offsets — every copy's orders point at
that copy's customers, lineitems at that copy's orders/parts/suppliers,
so join fan-outs, group cardinalities and skew shapes scale the way a
real sf increase would.  Values (prices, dates, texts, embeddings) are
reused verbatim; this is a PERFORMANCE corpus, not a correctness oracle
(the oracle gate stays on the driver's sf0.01 data).

Usage:  python scripts/make_scale_data.py [K] [out_dir]
        (defaults: K=10, out_dir=.localdata/sf1)

DuckDB does the replication — one streaming scan per copy, no Spark
session needed, so the output parquet is written row-group-sized for
the bench's reader.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

# table -> {column: stride-key} ; stride(key) = (max key + 1) of its
# own table so offset keys never collide across copies
KEYED = {
    "customer": {"c_custkey": "customer.c_custkey"},
    "supplier": {"s_suppkey": "supplier.s_suppkey"},
    "part": {"p_partkey": "part.p_partkey"},
    "orders": {
        "o_orderkey": "orders.o_orderkey",
        "o_custkey": "customer.c_custkey",
    },
    "lineitem": {
        "l_orderkey": "orders.o_orderkey",
        "l_partkey": "part.p_partkey",
        "l_suppkey": "supplier.s_suppkey",
    },
    "events": {"event_id": "events.event_id", "user_id": "events.user_id"},
    "documents": {"doc_id": "documents.doc_id"},
    "embeddings": {"vec_id": "embeddings.vec_id"},
}
COPY_AS_IS = ("region", "nation")


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else ".localdata/sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    strides: dict[str, int] = {}
    for spec in {s for cols in KEYED.values() for s in cols.values()}:
        table, col = spec.split(".")
        (mx,) = con.sql(
            f"SELECT MAX({col}) FROM '{SRC}/{table}.parquet'"
        ).fetchone()
        strides[spec] = int(mx) + 1

    for t in COPY_AS_IS:
        con.sql(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
            f"'{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied as-is")

    for t, cols in KEYED.items():
        src_cols = [
            c[0]
            for c in con.sql(
                f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
            ).fetchall()
        ]
        selects = []
        for i in range(k):
            proj = ", ".join(
                f"{c} + {i * strides[cols[c]]} AS {c}" if c in cols else c
                for c in src_cols
            )
            selects.append(f"SELECT {proj} FROM '{SRC}/{t}.parquet'")
        union = " UNION ALL ".join(selects)
        con.sql(
            f"COPY ({union}) TO '{out}/{t}.parquet' "
            "(FORMAT PARQUET, ROW_GROUP_SIZE 262144)"
        )
        (n,) = con.sql(f"SELECT COUNT(*) FROM '{out}/{t}.parquet'").fetchone()
        print(f"{t}: {n} rows (x{k})")


if __name__ == "__main__":
    main()
