"""Generate an sf1-equivalent fixture set by replicating sf0.1 with key offsets.

Usage: python examples/gen_scaled_sf.py [COPIES] [SRC_DIR] [DEST_DIR]
       (defaults: 10 /root/testdata/sf0.1 /tmp/sf1)

The driver ships sf0.001/0.01/0.1 only; the round-9 sf1 bench audit
(VERDICT r8 #4) needs 10x that, so this replicates each table with
per-copy key offsets that PRESERVE join relationships: every foreign key
offsets by the same stride as its referenced primary key, so copy i's
lineitems join copy i's orders/parts/suppliers — selectivities and
join fan-outs stay exactly sf0.1's, densities scale 10x. region/nation
stay fixed (constant-size in TPC-H proper). Document text gets a
per-copy suffix so near-dup semantics don't degenerate into every doc
having 9 exact clones (which would square the candidate-pair counts and
bench an adversarial workload instead of a scaled one); embeddings stay
byte-identical per copy (duplicate vectors only tie rankings, ids break
ties deterministically).

Row groups are written at 128k rows so Spark's scan splits the single
file across cores (same posture as the driver's own fixtures).
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

#: per-table {column: stride-source-table} — a column offsets by
#: (max key of its stride-source + 1) each copy, keeping FKs aligned
#: with the PKs they reference.
_KEYED = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
_COPY_AS_IS = ("region", "nation")
_ALL = list(_KEYED) + list(_COPY_AS_IS)


def _strides(src: str) -> dict[str, int]:
    out: dict[str, int] = {}
    for table, cols in _KEYED.items():
        t = pq.read_table(os.path.join(src, f"{table}.parquet"))
        for col, stride_src in cols.items():
            if stride_src == table:
                out[table] = int(pc.max(t.column(col)).as_py()) + 1
            elif stride_src == "events_user":
                out["events_user"] = int(pc.max(t.column(col)).as_py()) + 1
    return out


def generate(copies: int, src: str, dest: str) -> None:
    os.makedirs(dest, exist_ok=True)
    strides = _strides(src)
    for table in _COPY_AS_IS:
        t = pq.read_table(os.path.join(src, f"{table}.parquet"))
        pq.write_table(t, os.path.join(dest, f"{table}.parquet"))
        print(f"{table}: {t.num_rows} rows (fixed-size, copied)")
    for table, cols in _KEYED.items():
        t = pq.read_table(os.path.join(src, f"{table}.parquet"))
        parts = []
        for i in range(copies):
            c = t
            for col, stride_src in cols.items():
                stride = strides[stride_src]
                idx = c.schema.get_field_index(col)
                shifted = pc.add(c.column(col), pa.scalar(i * stride, pa.int64()))
                c = c.set_column(
                    idx, c.schema.field(col), shifted.cast(c.schema.field(col).type)
                )
            if table == "documents" and i > 0:
                idx = c.schema.get_field_index("text")
                perturbed = pc.binary_join_element_wise(
                    c.column("text").cast(pa.string()),
                    pa.scalar(f"zq{i}", pa.string()),
                    " ",
                )
                c = c.set_column(idx, c.schema.field("text"), perturbed)
                # keep the derived length column consistent with the text
                if "n_chars" in c.schema.names:
                    nidx = c.schema.get_field_index("n_chars")
                    n = pc.utf8_length(c.column("text"))
                    c = c.set_column(
                        nidx,
                        c.schema.field("n_chars"),
                        n.cast(c.schema.field("n_chars").type),
                    )
            parts.append(c)
        out = pa.concat_tables(parts)
        pq.write_table(
            out, os.path.join(dest, f"{table}.parquet"), row_group_size=131072
        )
        print(f"{table}: {out.num_rows} rows ({copies}x)")


if __name__ == "__main__":
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dest = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sf1"
    generate(copies, src, dest)
