"""Generate an sf1-scale rehearsal dataset in /tmp by 10x-replicating
/root/testdata/sf0.1 with consistent key remapping (BASELINE.md "sf1
rehearsal"; the reference's own e2e gates run at SCALE=1,
flink-end-to-end-tests/test-scripts/test_tpcds.sh:22).

Scaling discipline (TPC-H-like): fact AND dimension tables scale with SF
(customer/supplier/part/orders/lineitem/events/documents/embeddings x10,
keys offset per replica so referential joins keep per-key cardinalities);
region/nation stay fixed; date/time ranges stay fixed (10x the rows per
time window — how real SF scaling behaves). Content perturbation keeps
the *similarity structure* of documents/embeddings intact: replicas are
made dissimilar (every 4th word replaced / noise-mixed vectors) so
near-dup pair counts scale ~linearly instead of exploding quadratically
across replicas.

Deterministic (seeded per replica); ~10 part files per big table so the
scans parallelize like a real multi-file layout.

Usage: python tools/gen_sf1.py [dest]   (default /tmp/flink_spark_sf1)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
N_REP = 10

# key column -> stride source table (offset = replica * (max_key + 1))
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# which table each foreign key's stride comes from
STRIDE_OF = {
    "c_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}


def _perturb_text(texts: pd.Series, rep: int) -> pd.Series:
    """Replace every 4th word with a replica-salted token: word-level
    Jaccard vs the original ~0.6, shingle similarity far lower — below
    every near-dup threshold in the suite, so cross-replica pairs don't
    explode the MinHash/SimHash outputs."""
    if rep == 0:
        return texts

    def f(t: str) -> str:
        words = t.split(" ")
        return " ".join(
            f"w{rep}x{i % 7}" if i % 4 == 3 else w
            for i, w in enumerate(words)
        )

    return texts.map(f)


def _perturb_vecs(vecs: pd.Series, rep: int) -> pd.Series:
    """Mix in deterministic noise (norm-preserving-ish): cosine between a
    replica and its source drops to ~0.9, below the near-dup gates, while
    the marginal distribution stays comparable."""
    if rep == 0:
        return vecs
    rng = np.random.default_rng(42_000 + rep)
    out = []
    for v in vecs:
        a = np.asarray(v, dtype=np.float32)
        noise = rng.standard_normal(a.shape).astype(np.float32)
        nrm = np.linalg.norm(a) or 1.0
        noise *= 0.5 * nrm / (np.linalg.norm(noise) or 1.0)
        out.append(a + noise)
    return pd.Series(out, index=vecs.index)


def main() -> None:
    dest = sys.argv[1] if len(sys.argv) > 1 else "/tmp/flink_spark_sf1"
    os.makedirs(dest, exist_ok=True)
    marker = os.path.join(dest, "_ok_sf1")
    if os.path.exists(marker):
        print(f"already generated: {dest}")
        return

    strides: dict[tuple[str, str], int] = {}
    for tbl, cols in KEYED.items():
        pdf = pd.read_parquet(
            os.path.join(SRC, f"{tbl}.parquet"), columns=list(dict.fromkeys(cols))
        )
        for c in cols:
            strides[(tbl, c)] = int(pdf[c].max()) + 1

    for tbl in ["region", "nation"]:
        src = os.path.join(SRC, f"{tbl}.parquet")
        pq.write_table(pq.read_table(src), os.path.join(dest, f"{tbl}.parquet"))
        print(tbl, "copied")

    for tbl, cols in KEYED.items():
        base = pd.read_parquet(os.path.join(SRC, f"{tbl}.parquet"))
        out_dir = os.path.join(dest, f"{tbl}.parquet")
        os.makedirs(out_dir, exist_ok=True)
        for rep in range(N_REP):
            pdf = base.copy()
            for c in cols:
                stride = strides[STRIDE_OF[c]]
                pdf[c] = pdf[c] + rep * stride
            if tbl == "documents":
                pdf["text"] = _perturb_text(pdf["text"], rep)
                pdf["n_chars"] = pdf["text"].str.len().astype("int64")
            if tbl == "embeddings":
                pdf["embedding"] = _perturb_vecs(pdf["embedding"], rep)
            schema = pq.read_schema(os.path.join(SRC, f"{tbl}.parquet"))
            table = pa.Table.from_pandas(pdf, schema=schema, preserve_index=False)
            pq.write_table(
                table, os.path.join(out_dir, f"part-{rep:05d}.parquet")
            )
        print(tbl, "x", N_REP, "->", out_dir)

    with open(marker, "w") as fh:
        fh.write("ok")
    print("done:", dest)


if __name__ == "__main__":
    main()
