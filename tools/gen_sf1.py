"""Generate sf1 fixtures (~10x sf0.1) for the scaling spot-bench.

/root/testdata is read-only and holds nothing above sf0.1, so sf1 is
DERIVED from sf0.1 by 10x replication with key offsets — per-row content
(and therefore per-row work) is identical to sf0.1 while fact
cardinalities scale 10x, which is exactly the comparison the sf0.1->sf1
scaling ratios need. region/nation stay fixed (TPC-H semantics); all other
key domains are offset per replica so joins fan out 10x, not 100x.

Two tables need more than key offsets to keep the scaling HONEST:

- documents: verbatim replicas would be exact cross-replica duplicates —
  every dedup query's candidate blocks would grow quadratically by
  construction, not by plan behavior. Replica r>0 word-shuffles each text
  (seeded Fisher-Yates): same length/vocabulary/quality distribution, but
  shingle sets diverge, so near-dup structure scales like real data
  (within-replica dup pairs x10, no artificial cross-replica pairs).
- embeddings: verbatim replicas are cosine-1.0 cross-replica pairs (same
  quadratic artifact). Replica r>0 resamples each vector from its label's
  empirical per-component mean/std — cluster structure preserved, vectors
  new.

Usage: python tools/gen_sf1.py [out_dir] [replicas]
       (defaults: /tmp/etl_aws_spark_sf1, 10). replicas=30 generates the
       sf3 fixtures for the second scale octave (sf1->sf3 ratios in
       BASELINE.md): same construction, so within-replica structure per
       unit data is identical across octaves.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
REPLICAS = 10  # default; overridden by argv[2]

# key columns to offset, per table: {col: span_source_col_or_none}
OFFSET_KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# span of each key domain (max+1 at sf0.1), shared across tables so FK
# references stay consistent (orders.o_custkey offsets by customer's span)
KEY_DOMAIN = {
    "c_custkey": "customer.c_custkey",
    "o_custkey": "customer.c_custkey",
    "s_suppkey": "supplier.s_suppkey",
    "l_suppkey": "supplier.s_suppkey",
    "p_partkey": "part.p_partkey",
    "l_partkey": "part.p_partkey",
    "o_orderkey": "orders.o_orderkey",
    "l_orderkey": "orders.o_orderkey",
    "event_id": "events.event_id",
    "user_id": "events.user_id",
    "doc_id": "documents.doc_id",
    "vec_id": "embeddings.vec_id",
}


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/etl_aws_spark_sf1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else REPLICAS
    os.makedirs(out_dir, exist_ok=True)

    tables = {}
    for name in ["region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents", "embeddings"]:
        tables[name] = pq.read_table(os.path.join(SRC, f"{name}.parquet"))

    spans = {}
    for key, src in KEY_DOMAIN.items():
        tname, col = src.split(".")
        spans[key] = int(pa.compute.max(tables[tname][col]).as_py()) + 1

    for name in ["region", "nation"]:
        pq.write_table(tables[name], os.path.join(out_dir, f"{name}.parquet"))
        print(f"{name}: {tables[name].num_rows} rows (fixed dim)")

    for name, keys in OFFSET_KEYS.items():
        base = tables[name]
        pdf = base.to_pandas()
        reps = []
        for r in range(replicas):
            rep = pdf.copy()
            for k in keys:
                rep[k] = rep[k] + r * spans[k]
            # key-derived columns must track the offset key, or replica
            # rows share names and every name-blocked dedup block grows
            # 10x by construction (found via dedup_names_levenshtein at
            # sf1: identical c_name across replicas turned the blocked
            # pair join quadratic as a fixture artifact)
            if name == "customer":
                rep["c_name"] = rep["c_custkey"].map("Customer#{:09d}".format)
            if name == "supplier":
                rep["s_name"] = rep["s_suppkey"].map("Supplier#{:09d}".format)
            if r > 0 and name == "documents":
                rng = np.random.RandomState(1000 + r)
                rep["text"] = [
                    " ".join(rng.permutation(t.split()))
                    for t in rep["text"]
                ]
            if r > 0 and name == "embeddings":
                rng = np.random.RandomState(2000 + r)
                mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
                labels = pdf["label"].to_numpy()
                new = np.empty_like(mat)
                for lab in np.unique(labels):
                    m = labels == lab
                    mu, sd = mat[m].mean(axis=0), mat[m].std(axis=0)
                    new[m] = mu + rng.standard_normal((m.sum(), mat.shape[1])) * sd
                rep["embedding"] = [row.astype(np.float32) for row in new]
            reps.append(rep)
        import pandas as pd

        big = pd.concat(reps, ignore_index=True)
        schema = base.schema
        out = pa.Table.from_pandas(big, schema=schema, preserve_index=False)
        pq.write_table(out, os.path.join(out_dir, f"{name}.parquet"))
        print(f"{name}: {base.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
