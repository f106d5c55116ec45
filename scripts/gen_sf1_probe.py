#!/usr/bin/env python
"""Generate a ~10x probe dataset ("sf1") from the read-only sf0.1
testdata, for A/B measurements only — sf0.1 has hit its measurement
floor (8-core totals ~= 32-core totals: per-query cost is job-launch
and AQE constants, not data movement), so optimization trade-offs that
were a "wash at sf0.1" need a leg where the data term dominates.

NOT an oracle dataset and NOT a substitute for the driver's testdata:
/root/testdata is read-only and stays untouched; output goes to a
separate directory (default /root/sf1probe/sf1).

Construction: 10 shifted replicas of the sf0.1 universe — the same
scaling law as TPC-H (entity count grows, per-entity group sizes
stay), with per-table care so workload shape scales honestly:

- keyed tables: replica i shifts every primary/foreign key by
  i * (max_key + 1) of its key space, consistently across tables, so
  join fan-outs and per-key group sizes match sf0.1 exactly.
- nation/region: shared dimensions, kept as-is (25/5 rows — exactly
  how TPC-H scales).
- documents: every word in replica i>0 gets the suffix str(i), so
  replicas are disjoint in shingle space (pair counts scale linearly,
  like independent new content) while per-doc token/char structure is
  identical. n_chars is recomputed to stay consistent with the text.
- part names keep their spelling across replicas: fuzzy-name entity
  graphs get 10x nodes and denser clusters (name pools collide more
  as row count grows — the TPC-H name-generator behavior), which is
  the stress the CC probes want.
- embeddings: replica i multiplies each vector by a seeded ±1 sign
  pattern — intra-replica dot products are preserved EXACTLY
  (dot(x*s, y*s) = dot(x, y)) while cross-replica similarities are
  scrambled to noise, so kNN structure scales like real new data.
- events: timestamps unchanged (same one-month window, 10x users —
  how event streams actually grow).

Deterministic (numpy seeded per replica); pure pyarrow/numpy, no
Spark.
"""
from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/sf1probe/sf1"
REPLICAS = int(os.environ.get("SF1_REPLICAS", "10"))

# key column -> key space name; all columns sharing a space shift by
# the same offset so foreign keys stay consistent.
KEY_SPACES = {
    "c_custkey": "cust", "o_custkey": "cust",
    "o_orderkey": "order", "l_orderkey": "order",
    "p_partkey": "part", "l_partkey": "part",
    "s_suppkey": "supp", "l_suppkey": "supp",
    "event_id": "event", "user_id": "user",
    "doc_id": "doc", "vec_id": "vec",
}
SHARED_DIMS = {"nation", "region"}


def _key_offsets(tables: dict[str, pa.Table]) -> dict[str, int]:
    offs: dict[str, int] = {}
    for tname, tbl in tables.items():
        for col in tbl.column_names:
            space = KEY_SPACES.get(col)
            if space is None:
                continue
            mx = pc.max(tbl[col]).as_py() or 0
            offs[space] = max(offs.get(space, 0), int(mx) + 1)
    return offs


def _suffix_words(texts: list[str | None], suffix: str) -> list[str | None]:
    out = []
    for t in texts:
        if t is None:
            out.append(None)
        else:
            out.append(" ".join(w + suffix for w in t.split(" ")))
    return out


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    names = [f[:-8] for f in os.listdir(SRC) if f.endswith(".parquet")]
    tables = {n: pq.read_table(os.path.join(SRC, f"{n}.parquet")) for n in names}
    offs = _key_offsets(tables)
    for n in sorted(names):
        tbl = tables[n]
        if n in SHARED_DIMS:
            pq.write_table(tbl, os.path.join(DST, f"{n}.parquet"))
            print(f"{n}: shared dim, {tbl.num_rows} rows")
            continue
        parts = []
        for i in range(REPLICAS):
            cols = {}
            for col in tbl.column_names:
                arr = tbl[col]
                space = KEY_SPACES.get(col)
                if space is not None and i > 0:
                    arr = pc.add(arr, pa.scalar(i * offs[space], type=arr.type))
                elif n == "documents" and col == "text" and i > 0:
                    arr = pa.array(_suffix_words(arr.to_pylist(), str(i)), type=pa.string())
                elif n == "documents" and col == "n_chars":
                    # recomputed below once text is final
                    pass
                elif n == "embeddings" and col == "embedding" and i > 0:
                    flat = np.asarray(arr.combine_chunks().values, dtype=np.float32)
                    offsets = np.asarray(arr.combine_chunks().offsets)
                    dim = offsets[1] - offsets[0]
                    rng = np.random.default_rng(42 + i)
                    signs = rng.choice([-1.0, 1.0], size=dim).astype(np.float32)
                    flat = (flat.reshape(-1, dim) * signs).reshape(-1)
                    arr = pa.ListArray.from_arrays(pa.array(offsets), pa.array(flat))
                cols[col] = arr
            if n == "documents":
                txt = cols["text"].to_pylist() if i > 0 else tbl["text"].to_pylist()
                cols["n_chars"] = pa.array(
                    [None if t is None else len(t) for t in txt], type=pa.int64()
                )
            parts.append(pa.table(cols, schema=None))
        out = pa.concat_tables(parts)
        # cast back to the source schema (sans pandas metadata) so key
        # types survive the arithmetic unchanged
        out = out.cast(pa.schema([tbl.schema.field(c) for c in tbl.column_names]))
        pq.write_table(out, os.path.join(DST, f"{n}.parquet"))
        print(f"{n}: {tbl.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
