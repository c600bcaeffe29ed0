"""Build a deterministic sf1.0-SCALE measurement corpus from sf0.1.

The driver's own sf1.0 directory is generated on its side and is not
present in the sandbox between sessions, so optimization rounds need a
local stand-in at the same row counts to check that plan changes hold
at 10x. This scales the four big tables 10x with length/value
perturbation (so near-dup structure does not explode the pair space the
way verbatim copies would) and copies the small dimension tables as-is.
Pure function of (copy index, row) — no RNG state, reproducible.

Usage::

    python tools/make_bigsf.py [src_dir] [dst_dir]   # default sf0.1 -> /tmp/sfbig

NOT part of the bench contract; measurement infrastructure only.
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

COPIES = 10


def scale_documents(src: str, dst: str) -> None:
    t = pq.read_table(src).to_pandas()
    n = len(t)
    out = []
    for j in range(COPIES):
        c = t.copy()
        c["doc_id"] = c["doc_id"] + j * n
        if j > 0:
            # rotate tokens by j and drop j%3 trailing tokens: same
            # length statistics, different shingle sets per copy
            def perturb(s: str, j=j) -> str:
                w = s.split()
                w = w[j % len(w):] + w[: j % len(w)]
                if j % 3 and len(w) > 3:
                    w = w[: -(j % 3)]
                return " ".join(w)

            c["text"] = c["text"].map(perturb)
            c["n_chars"] = c["text"].str.len()
        out.append(c)
    import pandas as pd

    big = pd.concat(out, ignore_index=True)
    pq.write_table(pa.Table.from_pandas(big, preserve_index=False), dst)
    print(f"documents: {len(big)} rows")


def scale_embeddings(src: str, dst: str) -> None:
    t = pq.read_table(src).to_pandas()
    n = len(t)
    out = []
    id_col = "vec_id"
    vec_col = "embedding"
    for j in range(COPIES):
        c = t.copy()
        c[id_col] = c[id_col] + j * n
        if j > 0:
            # deterministic small rotation of vector entries per copy
            c[vec_col] = c[vec_col].map(
                lambda v, j=j: np.roll(np.asarray(v), j).tolist()
            )
        out.append(c)
    import pandas as pd

    big = pd.concat(out, ignore_index=True)
    schema = pq.read_schema(src)
    schema = pa.schema([schema.field(i) for i in range(len(schema.names))])
    pq.write_table(
        pa.Table.from_pandas(big, schema=schema, preserve_index=False), dst
    )
    print(f"embeddings: {len(big)} rows")


def scale_offset(src: str, dst: str, id_cols: list[str], ts_cols: list[str]) -> None:
    t = pq.read_table(src).to_pandas()
    n = len(t)
    out = []
    for j in range(COPIES):
        c = t.copy()
        for ic in id_cols:
            if ic in c.columns:
                c[ic] = c[ic] + j * (int(t[ic].max()) + 1)
        for tc in ts_cols:
            if tc in c.columns:
                c[tc] = c[tc] + np.timedelta64(j, "h") if str(
                    c[tc].dtype
                ).startswith("datetime") else c[tc] + j * 3600
        out.append(c)
    import pandas as pd

    big = pd.concat(out, ignore_index=True)
    pq.write_table(pa.Table.from_pandas(big, preserve_index=False), dst)
    print(f"{os.path.basename(dst)}: {len(big)} rows")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfbig"
    os.makedirs(dst, exist_ok=True)
    scale_documents(f"{src}/documents.parquet", f"{dst}/documents.parquet")
    scale_embeddings(f"{src}/embeddings.parquet", f"{dst}/embeddings.parquet")
    scale_offset(
        f"{src}/events.parquet", f"{dst}/events.parquet",
        ["event_id", "user_id"], ["ts"],
    )
    for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]:
        shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    print(f"done -> {dst}")


if __name__ == "__main__":
    main()
