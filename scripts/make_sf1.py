"""Build an APPROXIMATE sf1.0 dataset for local timing only (the driver
measures at sf=1.0 but ships only sf≤0.1): replicate sf0.1 10x with
shifted ids. Row counts and value shapes match the real sf1.0 closely
enough for per-query A/B timing; NEVER used for correctness gating.

Usage: python scripts/make_sf1.py [out_dir]   (default /dev/shm/sfX1)
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/sfX1"
K = 10

# table -> (id column to shift, rows at sf0.1)
SHIFT = {
    "documents": "doc_id",
    "embeddings": "vec_id",
    "events": "event_id",
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
}
COPY = ["region", "nation"]


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for name in COPY:
        t = pq.read_table(f"{SRC}/{name}.parquet")
        pq.write_table(t, f"{OUT}/{name}.parquet")
        print(name, t.num_rows)
    for name, idcol in SHIFT.items():
        t = pq.read_table(f"{SRC}/{name}.parquet")
        n = t.num_rows
        parts = []
        for k in range(K):
            if k == 0:
                parts.append(t)
                continue
            shifted = t.set_column(
                t.schema.get_field_index(idcol), idcol,
                pc.add(t.column(idcol), pa.scalar(k * n, t.column(idcol).type)),
            )
            parts.append(shifted)
        big = pa.concat_tables(parts)
        pq.write_table(big, f"{OUT}/{name}.parquet",
                       row_group_size=1 << 20)
        print(name, big.num_rows)


if __name__ == "__main__":
    main()
