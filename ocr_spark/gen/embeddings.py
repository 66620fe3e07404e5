"""Seeded mixture-of-Gaussians embedding fixture (VERDICT r2 #5).

The driver's synthetic ``embeddings.parquet`` has no cosine cluster
structure (TESTDATA.md: same-label similarity ≈ cross-label), so ANN
recall measured on it sits near chance REGARDLESS of banding/probe
parameters — the operator shapes are exercised but untuned. This
generator produces a corpus with REAL cluster structure so
scripts/recall_bench.py can measure recall lift and tune (bands × bits):

  * ``n_clusters`` unit centers drawn from a seeded standard normal;
  * each vector = its cluster center + (``noise``/√dim) · N(0, I), then
    L2-normalized — the noise VECTOR has expected norm ``noise``
    (per-component scaling alone would give norm noise·√dim and drown
    a unit center in 64-D), so within-cluster cosine ≈ 1/(1+noise²)
    >> the ≈0 cross-cluster cosine of random directions;
  * schema matches the driver table exactly: (vec_id BIGINT,
    embedding FLOAT[], label INT) with ``label`` = the TRUE cluster id,
    so the IVF cell prior is meaningful.

Deterministic: numpy default_rng with a fixed seed; byte-stable parquet
across runs.
"""

from __future__ import annotations

import os

import numpy as np

DIM = 64


def clustered_embeddings(n: int = 500, dim: int = DIM,
                         n_clusters: int = 10, noise: float = 0.35,
                         seed: int = 1234) -> tuple[np.ndarray, np.ndarray]:
    """Return (vectors[n, dim] float32 L2-normalized, labels[n] int32)."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = np.arange(n) % n_clusters
    vecs = centers[labels] + (noise / np.sqrt(dim)) * \
        rng.standard_normal((n, dim))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    return vecs.astype(np.float32), labels.astype(np.int32)


def write_clustered_fixture(out_dir: str, n: int = 500,
                            n_clusters: int = 10, noise: float = 0.35,
                            seed: int = 1234) -> str:
    """Write ``<out_dir>/embeddings.parquet`` in the driver-table schema;
    returns ``out_dir`` (usable as an ``sf_dir`` for the simsearch
    queries)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    vecs, labels = clustered_embeddings(n=n, n_clusters=n_clusters,
                                        noise=noise, seed=seed)
    tbl = pa.table({
        "vec_id": pa.array(range(n), type=pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              type=pa.list_(pa.float32())),
        "label": pa.array(labels, type=pa.int32()),
    })
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(tbl, os.path.join(out_dir, "embeddings.parquet"))
    return out_dir
