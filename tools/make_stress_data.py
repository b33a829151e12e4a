"""Deterministic stress-scale replicas of the synthetic warehouse
(round-8 task: heavy-tail asymptotics need a point beyond sf0.1).

Builds sf0.3 / sf0.5 directories by unioning K disjoint, internally
consistent shards of the sf0.1 tables: every entity key (orderkey,
custkey, suppkey, partkey, event/user ids, doc/vec ids) shifts by
i * 10^7 in shard i, so foreign keys stay valid, per-key structure
(degrees, series lengths, basket sizes) is UNCHANGED, and only the data
VOLUME grows — exactly the shape a scale-up test wants. Key-modulo
fixture patterns (doc_id % 2/10, l_partkey % 10) survive because the
shift is a multiple of 10. Dimension tables (region, nation) are copied
once, unshifted. Document texts get a per-shard marker paragraph so
shards don't create cross-shard exact-duplicate pairs (which would make
dedup outputs grow quadratically in K by construction rather than by
algorithm). No RNG anywhere — byte-deterministic given the inputs.

Usage: python tools/make_stress_data.py [src_dir] [out_root]
Writes {out_root}/sf0.3 (K=3) and {out_root}/sf0.5 (K=5).
"""
from __future__ import annotations

import os
import sys

import duckdb

SHIFT = 10_000_000
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation"]


def shard_select(table: str, cols: list[tuple[str, str]], i: int) -> str:
    exprs = []
    for name, _dtype in cols:
        if name in KEY_COLS.get(table, []):
            exprs.append(f"{name} + {i * SHIFT} AS {name}")
        elif table == "customer" and name == "c_name" and i > 0:
            # er1/er2 block on substring(c_name,1,17) AND suffix-6 and
            # gate at levenshtein<=2: verbatim name copies would co-block
            # ACROSS shards at lev 0/1 and merge everything (cluster sizes
            # ~K, pairs ~K^2 by construction, not by algorithm). Embed
            # custkey + i*10^5 instead: keys < 15000 < 10^5 keep shard
            # display ranges disjoint, and the changed 10^5 digit sits at
            # char 13 — inside BOTH blocking keys — so blocks stay
            # shard-local while within-shard lev structure is unchanged.
            exprs.append(
                f"'Customer#' || lpad(CAST(c_custkey + {i * 100_000} "
                "AS VARCHAR), 9, '0') AS c_name"
            )
        elif table == "documents" and name == "text" and i > 0:
            exprs.append(f"text || '\\ncopyshard{i}' AS text")
        elif table == "documents" and name == "n_chars" and i > 0:
            exprs.append(f"n_chars + {len(f'copyshard{i}') + 1} AS n_chars")
        else:
            exprs.append(name)
    return "SELECT " + ", ".join(exprs) + " FROM src"


def build(src_dir: str, out_root: str) -> None:
    con = duckdb.connect()
    for label, k in (("sf0.3", 3), ("sf0.5", 5)):
        out = os.path.join(out_root, label)
        os.makedirs(out, exist_ok=True)
        for t in DIMS + list(KEY_COLS):
            src = f"{src_dir}/{t}.parquet"
            con.execute(
                f"CREATE OR REPLACE VIEW src AS SELECT * FROM read_parquet('{src}')"
            )
            cols = [
                (r[0], r[1])
                for r in con.execute("DESCRIBE SELECT * FROM src").fetchall()
            ]
            if t in DIMS:
                q = "SELECT * FROM src"
            else:
                q = " UNION ALL ".join(shard_select(t, cols, i) for i in range(k))
            con.execute(
                f"COPY ({q}) TO '{out}/{t}.parquet' (FORMAT PARQUET)"
            )
            n = con.execute(
                f"SELECT COUNT(*) FROM read_parquet('{out}/{t}.parquet')"
            ).fetchone()[0]
            print(f"{label}/{t}: {n} rows")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/stress_data"
    build(src, out)
