"""Build a key-shifted 10x tiling of an sf dir — the scale-decade probe
input (VERDICT r4 next-round #5).  Fact tables are replicated with
primary/foreign keys shifted by i*OFFSET per tile so entity identity is
preserved (no accidental key collisions across tiles); dimension tables
are copied as-is (same 25 nations at any scale, like TPC-H).

    python tools/tile_sf.py /root/testdata/sf0.1 /tmp/sf1_tiled 10
"""

from __future__ import annotations

import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

OFFSET = 100_000_000

# per-table integer columns to shift (entity keys owned by fact tables;
# dim FKs like o_custkey stay — dims are not tiled)
SHIFT = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation", "customer", "supplier", "part"]


def main() -> int:
    src, dst, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
    import os

    os.makedirs(dst, exist_ok=True)
    for t in DIMS:
        pq.write_table(pq.read_table(f"{src}/{t}.parquet"), f"{dst}/{t}.parquet")
        print(t, "copied")
    for t, cols in SHIFT.items():
        base = pq.read_table(f"{src}/{t}.parquet")
        tiles = []
        for i in range(n):
            tb = base
            for c in cols:
                tb = tb.set_column(
                    tb.schema.get_field_index(c),
                    c,
                    pc.add(tb.column(c), i * OFFSET),
                )
            tiles.append(tb)
        out = pa.concat_tables(tiles)
        pq.write_table(out, f"{dst}/{t}.parquet")
        print(t, len(base), "->", len(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
