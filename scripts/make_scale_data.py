"""Scale-up replicator for the BASELINE.md scaling curve (round-2
VERDICT item 3: measure the sweep at sf1).

The driver ships deterministic testdata at sf0.001/0.01/0.1 only; this
script builds an sfN-equivalent volume by replicating sf0.1 K times
with consistent per-copy key offsets — every copy's orders point at
that copy's customers, lineitems at that copy's orders/parts/suppliers,
so join fan-outs, group cardinalities and skew shapes scale the way a
real sf increase would.  This is a PERFORMANCE corpus, not a
correctness oracle (the oracle gate stays on the driver's sf0.01 data).

Texts and embeddings are MUTATED per copy, not reused verbatim: naive
replication gives every document 9 identical twins, which inflates the
near-dup pair space ~K²/2-fold and turns every dedup-family query into
a pathological all-cliques workload (measured 70× growth for 10× data
— an artifact of the replication, not of scale).  Copy i Caesar-rotates
the document text by i (token structure, lengths and within-copy dup
rate preserved; cross-copy texts disjoint) and adds a deterministic
per-copy perturbation to embeddings (cosine between copies drops well
below the near-dup thresholds).

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

    lower = "abcdefghijklmnopqrstuvwxyz"
    upper = lower.upper()

    def mutate(t: str, c: str, i: int) -> str | None:
        """Per-copy value mutation expression (None = reuse verbatim)."""
        # entity names regenerate from the OFFSET key — otherwise every
        # name exists K times and name-blocked linkage queries degrade
        # to quadratic all-clique joins (same artifact as verbatim text)
        if t == "customer" and c == "c_name":
            off = i * strides["customer.c_custkey"]
            return (
                f"'Customer#' || lpad(CAST(c_custkey + {off} AS VARCHAR),"
                f" 9, '0') AS {c}"
            )
        if t == "supplier" and c == "s_name":
            off = i * strides["supplier.s_suppkey"]
            return (
                f"'Supplier#' || lpad(CAST(s_suppkey + {off} AS VARCHAR),"
                f" 9, '0') AS {c}"
            )
        if t == "documents" and c == "text" and i > 0:
            rl = lower[i:] + lower[:i]
            ru = upper[i:] + upper[:i]
            return f"translate({c}, '{lower}{upper}', '{rl}{ru}') AS {c}"
        if t == "embeddings" and c == "embedding" and i > 0:
            return (
                f"list_transform(list_zip({c}, range(1, len({c}) + 1)),"
                f" z -> CAST(z[1] + 0.05 * (({i} * 31 + z[2]) % 7 - 3)"
                f" AS FLOAT)) AS {c}"
            )
        return None

    for t, cols in KEYED.items():
        src_cols = [
            c[0]
            for c in con.sql(
                f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
            ).fetchall()
        ]
        # one parquet FILE per copy under a directory: Spark assigns scan
        # splits per file/byte-range, so a single big file caps the scan
        # (and everything cached from it) at 1-2 tasks — the first sf1
        # sweep ran text queries single-threaded because of exactly this
        os.makedirs(f"{out}/{t}.parquet", exist_ok=True)
        for i in range(k):
            proj = ", ".join(
                f"{c} + {i * strides[cols[c]]} AS {c}"
                if c in cols
                else (mutate(t, c, i) or c)
                for c in src_cols
            )
            con.sql(
                f"COPY (SELECT {proj} FROM '{SRC}/{t}.parquet') TO "
                f"'{out}/{t}.parquet/copy{i:03d}.parquet' "
                "(FORMAT PARQUET, ROW_GROUP_SIZE 262144)"
            )
        (n,) = con.sql(
            f"SELECT COUNT(*) FROM '{out}/{t}.parquet/*.parquet'"
        ).fetchone()
        print(f"{t}: {n} rows (x{k}, {k} files)")


if __name__ == "__main__":
    main()
