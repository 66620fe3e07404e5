#!/usr/bin/env python
"""Materialize a deterministic 10x (sf1) scaling corpus under
.bench_tmp/sf1 for the round-5 sf-scaling bench (round-4 verdict #2).

The driver ships sf{0.001,0.01,0.1}; every scale claim so far is
measured at sf0.1 where fixed Spark overhead dominates, so the
documented scale shapes (bucket caps, broadcast sides, pre-aggregated
probes) get one empirical 10x point here. The tables are synthesized
to preserve sf0.1's STATISTICAL shape rather than replicating rows
(verbatim copies would turn every doc into a 10-member near-dup
cluster and quadratically distort the pair-generating queries):

* documents (5k -> 50k): rows 0..4999 are the driver rows verbatim;
  each new row keeps a base row's lang/source/word-count but redraws
  every token from the sf0.1 vocabulary with md5(doc_id, position)
  draws -- same vocab, same length mix, independent content.
* embeddings (2k -> 20k): driver rows verbatim (the vec_id<10 query
  set stays fixed); new vectors are md5-uniform in [-1,1) with
  label = vec_id % n_labels, matching the fixture's unclustered shape.
* events (100k -> 1M): 10 copies with disjoint user/event id ranges
  (per-user journey structure preserved exactly; 10x the users).
* dimension/TPC-H tables: copied as-is (the sf1 bench only scales the
  webtext-tier tables; q1-q22 keep their own driver-sized inputs).

Deterministic end to end -- re-running yields byte-identical parquet.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"
DST = os.path.join(REPO, ".bench_tmp", "sf1")
COPIES = 10


def _u(tag: str) -> float:
    """md5-seeded uniform in [0, 1)."""
    h = hashlib.md5(tag.encode()).hexdigest()
    return int(h[:12], 16) / float(1 << 48)


def build() -> str:
    import duckdb
    import numpy as np
    import pandas as pd

    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()

    # ---- documents ---------------------------------------------------
    base = con.sql(
        f"SELECT doc_id, text, lang, source, n_chars "
        f"FROM '{SRC}/documents.parquet' ORDER BY doc_id").df()
    n0 = len(base)
    vocab = sorted({w for t in base.text for w in t.split()})
    nv = len(vocab)
    out = [base]
    for c in range(1, COPIES):
        rows = []
        for _, r in base.iterrows():
            did = int(r.doc_id) + c * n0
            nw = len(r.text.split())
            words = [vocab[int(hashlib.md5(f"sf1_{did}_{i}".encode())
                               .hexdigest()[:8], 16) % nv]
                     for i in range(nw)]
            text = " ".join(words)
            rows.append((did, text, r.lang, r.source, len(text)))
        out.append(pd.DataFrame(
            rows, columns=["doc_id", "text", "lang", "source", "n_chars"]))
    docs = pd.concat(out, ignore_index=True)
    docs["doc_id"] = docs["doc_id"].astype("int64")
    docs["n_chars"] = docs["n_chars"].astype("int64")
    con.sql("CREATE OR REPLACE VIEW d AS SELECT * FROM docs")
    con.sql(f"COPY d TO '{DST}/documents.parquet' (FORMAT PARQUET)")

    # ---- embeddings --------------------------------------------------
    emb = con.sql(
        f"SELECT vec_id, embedding, label "
        f"FROM '{SRC}/embeddings.parquet' ORDER BY vec_id").df()
    n_emb0 = len(emb)
    n_labels = int(emb.label.max()) + 1
    dim = len(emb.embedding.iloc[0])
    new_rows = []
    for vid in range(n_emb0, n_emb0 * COPIES):
        vec = np.array([round(_u(f"sf1v_{vid}_{d}") * 2.0 - 1.0, 6)
                        for d in range(dim)], dtype="float32")
        new_rows.append((vid, vec, vid % n_labels))
    emb_all = pd.concat(
        [emb, pd.DataFrame(new_rows,
                           columns=["vec_id", "embedding", "label"])],
        ignore_index=True)
    emb_all["vec_id"] = emb_all["vec_id"].astype("int64")
    emb_all["label"] = emb_all["label"].astype(emb.label.dtype)
    con.sql("CREATE OR REPLACE VIEW e AS SELECT * FROM emb_all")
    con.sql(f"COPY e TO '{DST}/embeddings.parquet' (FORMAT PARQUET)")

    # ---- events ------------------------------------------------------
    stats = con.sql(
        f"SELECT MAX(user_id) AS mu, MAX(event_id) AS me, COUNT(*) AS n "
        f"FROM '{SRC}/events.parquet'").df().iloc[0]
    parts = [f"SELECT * FROM '{SRC}/events.parquet'"]
    for c in range(1, COPIES):
        parts.append(
            f"SELECT event_id + {c * (int(stats.me) + 1)} AS event_id, "
            f"ts, user_id + {c * (int(stats.mu) + 1)} AS user_id, "
            f"event_type, value, props "
            f"FROM '{SRC}/events.parquet'")
    con.sql(f"COPY ({' UNION ALL '.join(parts)}) "
            f"TO '{DST}/events.parquet' (FORMAT PARQUET)")

    # ---- everything else: verbatim -----------------------------------
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem"):
        dst = os.path.join(DST, f"{name}.parquet")
        if not os.path.exists(dst):
            shutil.copyfile(os.path.join(SRC, f"{name}.parquet"), dst)
    return DST


if __name__ == "__main__":
    path = build()
    import duckdb
    for t in ("documents", "embeddings", "events"):
        n = duckdb.sql(
            f"SELECT COUNT(*) FROM '{path}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n}")
    print(path)
