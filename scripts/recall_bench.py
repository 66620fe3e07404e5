#!/usr/bin/env python
"""Recall measurement for the approximate operators against their exact
ground truth — the ANN/dedup analogue of the throughput bench ("measure,
don't guess", ROADMAP):

  * ANN: recall@k of emb_lsh_multiprobe_topk and emb_ivf_topk against
    the brute-force cosine ranking (the exactness baseline computed by
    emb_cosine_topk with k widened);
  * dedup: recall of the MinHash-LSH candidate pairs (as verified by
    docs_jaccard_verify_candidates) against all true high-Jaccard pairs
    found by the exhaustive blocked self-join (docs_ngram_jaccard_pairs)
    at several Jaccard thresholds.

Caveat (recorded in the output): the synthetic embeddings have no real
cluster structure (TESTDATA.md), so ANN recall here characterizes the
operator shape on near-random vectors — a lower bound, not a tuned
figure. Writes BENCH/recall.json.

Usage: python scripts/recall_bench.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = "/root/testdata/sf0.01"


def main() -> int:
    from pyspark.sql import functions as F

    from ocr_spark.plans import dataops, simsearch
    from ocr_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else SF_DIR
    spark = get_spark("recall_bench", master="local[8]")
    out: dict = {"sf_dir": sf_dir,
                 "caveat": ("synthetic embeddings have no cluster "
                            "structure; ANN recall is a near-random-"
                            "vector lower bound")}

    # ---- ANN recall@k vs brute force --------------------------------
    # ONE brute-force run; both truth sets (top-5 and the IVF top-3
    # subset) come from the same collected ranking
    k = simsearch.TOPK
    truth_rows = simsearch.emb_cosine_topk(spark, sf_dir).collect()
    truth = {(r.q_id, r.neighbor_id) for r in truth_rows}
    n_truth = len(truth)

    emb = simsearch.t(spark, sf_dir)
    n_vecs = emb.count()
    n_cells = emb.select("label").distinct().count()

    # per-method truth at the method's own k (IVF returns top-3)
    truth3 = {(r.q_id, r.neighbor_id) for r in truth_rows
              if r.rank <= simsearch.IVF_TOPK}

    mp = {(r.q_id, r.neighbor_id)
          for r in simsearch.emb_lsh_multiprobe_topk(spark, sf_dir)
          .filter(F.col("rank") <= k).collect()}
    ivf = {(r.q_id, r.neighbor_id)
           for r in simsearch.emb_ivf_topk(spark, sf_dir).collect()}

    # analytic chance baseline: a method that examines an expected c
    # candidates per query AT RANDOM gets recall ≈ c/(N-1); lift =
    # recall/chance isolates what the bucketing itself contributes,
    # which matters because on these unclustered synthetic vectors
    # absolute recall is structurally low.
    mp_cand = (simsearch.EMB_LSH_BANDS * (simsearch.EMB_BAND_BITS + 1)
               * n_vecs / (2 ** simsearch.EMB_BAND_BITS))
    ivf_cand = n_vecs / max(1, n_cells) - 1
    mp_recall = len(mp & truth) / n_truth
    ivf_recall = len(ivf & truth3) / max(1, len(truth3))
    out["ann"] = {
        "n_vectors": n_vecs,
        "multiprobe": {
            "k": k, "recall_at_k": round(mp_recall, 4),
            "expected_candidates_per_query": round(mp_cand, 1),
            "chance_recall": round(mp_cand / (n_vecs - 1), 4),
            "lift_over_chance": round(mp_recall
                                      / (mp_cand / (n_vecs - 1)), 2),
        },
        "ivf": {
            "k": simsearch.IVF_TOPK, "recall_at_k": round(ivf_recall, 4),
            "expected_candidates_per_query": round(ivf_cand, 1),
            "chance_recall": round(ivf_cand / (n_vecs - 1), 4),
            "lift_over_chance": round(ivf_recall
                                      / (ivf_cand / (n_vecs - 1)), 2),
            "note": ("IVF probes the pretrained label cells, which are "
                     "NOT cosine clusters on this synthetic corpus "
                     "(TESTDATA.md) — recall ≈ chance here by "
                     "construction; with k-means cells (emb_ivf_assign "
                     "is the assignment op) the cell prior returns"),
        },
    }

    # ---- clustered fixture: recall with real structure + tuning -----
    # (VERDICT r2 #5) the driver corpus has no cosine clusters, so the
    # numbers above are a structureless lower bound; re-measure on the
    # seeded mixture-of-Gaussians fixture and sweep bands × bits.
    from ocr_spark.gen.embeddings import write_clustered_fixture
    cdir = write_clustered_fixture(
        os.path.join(REPO, ".bench_tmp", "clustered_emb"))
    ct_rows = simsearch.emb_cosine_topk(spark, cdir).collect()
    ctruth = {(r.q_id, r.neighbor_id) for r in ct_rows}
    ctruth3 = {(r.q_id, r.neighbor_id) for r in ct_rows
               if r.rank <= simsearch.IVF_TOPK}
    cn = simsearch.t(spark, cdir).count()
    c_cells = simsearch.t(spark, cdir).select("label").distinct().count()

    sweep = {}
    saved = (simsearch.EMB_LSH_BANDS, simsearch.EMB_BAND_BITS)
    try:
        for bands in (1, 2, 4):
            bits = simsearch.LSH_PLANES // bands
            simsearch.EMB_LSH_BANDS = bands
            simsearch.EMB_BAND_BITS = bits
            got = {(r.q_id, r.neighbor_id)
                   for r in simsearch.emb_lsh_multiprobe_topk(spark, cdir)
                   .filter(F.col("rank") <= k).collect()}
            cand = (bands * (bits + 1) * cn / (2 ** bits))
            chance = cand / (cn - 1)
            rec = len(got & ctruth) / max(1, len(ctruth))
            sweep[f"{bands}x{bits}"] = {
                "recall_at_k": round(rec, 4),
                "expected_candidates_per_query": round(cand, 1),
                "chance_recall": round(chance, 4),
                "lift_over_chance": round(rec / chance, 1) if chance else None,
            }
    finally:
        simsearch.EMB_LSH_BANDS, simsearch.EMB_BAND_BITS = saved

    civf = {(r.q_id, r.neighbor_id)
            for r in simsearch.emb_ivf_topk(spark, cdir).collect()}
    civf_cand = cn / max(1, c_cells) - 1
    civf_rec = len(civf & ctruth3) / max(1, len(ctruth3))
    out["ann_clustered"] = {
        "fixture": "gen/embeddings.py mixture-of-Gaussians "
                   "(10 clusters, noise 0.35, seed 1234)",
        "n_vectors": cn,
        "multiprobe_sweep_bands_x_bits": sweep,
        "tuning_note": (
            "the shipped default 2 bands x 8 bits is the operating "
            "point: 1x16 prunes hardest but under-recalls (collisions "
            "too rare for Hamming-1 probes to rescue), 4x4 reaches "
            "full recall only by examining MORE candidates than the "
            "corpus (no pruning at all); 2x8 combines high recall "
            "with a ~7% candidate fraction"),
        "ivf": {
            "k": simsearch.IVF_TOPK,
            "recall_at_k": round(civf_rec, 4),
            "chance_recall": round(civf_cand / (cn - 1), 4),
            "lift_over_chance": round(civf_rec / (civf_cand / (cn - 1)), 1),
            "note": "labels ARE the true clusters on this fixture, so "
                    "the cell prior is live",
        },
    }

    # ---- trained IVF (Lloyd k-means cells, round 4) ------------------
    tr = simsearch.emb_ivf_trained_topk(spark, cdir).collect()
    tivf = {(r.q_id, r.neighbor_id) for r in tr}
    n_tcells = len({r.cell for r in tr})
    tcand = cn / max(1, simsearch.KM_K) - 1
    trec = len(tivf & ctruth3) / max(1, len(ctruth3))
    tchance = tcand / (cn - 1)
    out["ann_clustered"]["ivf_trained"] = {
        "k": simsearch.IVF_TOPK,
        "kmeans_k": simsearch.KM_K,
        "lloyd_iters": simsearch.KM_ITERS,
        "n_probed_cells_in_results": n_tcells,
        "recall_at_k": round(trec, 4),
        "chance_recall": round(tchance, 4),
        "lift_over_chance": round(trec / tchance, 1) if tchance else None,
        "note": ("cells learned in-plan by emb_kmeans_train (Lloyd, "
                 "fixed iters, deterministic first-K init) — the "
                 "quantizer no longer leans on the fixture label"),
    }

    # ---- trained-IVF multiprobe + IVF-PQ (round 4) -------------------
    mp_tr = {(r.q_id, r.neighbor_id)
             for r in simsearch.emb_ivf_trained_multiprobe_topk(spark, cdir)
             .collect()}
    mp_trec = len(mp_tr & ctruth3) / max(1, len(ctruth3))
    mp_tcand = simsearch.IVF_NPROBE * tcand
    out["ann_clustered"]["ivf_trained_multiprobe"] = {
        "k": simsearch.IVF_TOPK,
        "nprobe": simsearch.IVF_NPROBE,
        "recall_at_k": round(mp_trec, 4),
        "chance_recall": round(mp_tcand / (cn - 1), 4),
        "lift_over_chance": (round(mp_trec / (mp_tcand / (cn - 1)), 1)
                             if mp_tcand else None),
    }
    pq_sweep = {}
    saved_sl = simsearch.PQ_SHORTLIST
    try:
        for sl in (8, 16, 32, 64):
            simsearch.PQ_SHORTLIST = sl
            pq = {(r.q_id, r.neighbor_id)
                  for r in simsearch.emb_ivfpq_topk(spark, cdir).collect()}
            pq_sweep[str(sl)] = round(
                len(pq & ctruth3) / max(1, len(ctruth3)), 4)
    finally:
        simsearch.PQ_SHORTLIST = saved_sl
    out["ann_clustered"]["ivfpq"] = {
        "k": simsearch.IVF_TOPK,
        "nprobe": simsearch.IVF_NPROBE,
        "pq_m": simsearch.PQ_M, "pq_k": simsearch.PQ_K,
        "shortlist_default": simsearch.PQ_SHORTLIST,
        "recall_at_k_by_shortlist": pq_sweep,
        "recall_trained_multiprobe_same_probes": round(mp_trec, 4),
        "note": ("same probed cells as ivf_trained_multiprobe, so the "
                 "gap to its recall isolates what the PQ-ADC shortlist "
                 "costs: candidates the seeded (untrained) 8x16 "
                 "codebook mis-ranks out of the shortlist before exact "
                 "re-rank sees them. Re-rank depth is the production "
                 "knob — deeper shortlists recover recall at linear "
                 "re-rank cost; trained per-subspace codebooks (the "
                 "documented drop-in at _pq_codebooks) shrink the "
                 "needed depth"),
    }

    # ---- trained-PQ IVF-PQ: same sweep, Lloyd-trained codebooks -----
    tpq_sweep = {}
    saved_sl = simsearch.PQ_SHORTLIST
    try:
        for sl in (8, 16, 32, 64):
            simsearch.PQ_SHORTLIST = sl
            tpq = {(r.q_id, r.neighbor_id)
                   for r in simsearch.emb_ivfpq_trained_topk(spark, cdir)
                   .collect()}
            tpq_sweep[str(sl)] = round(
                len(tpq & ctruth3) / max(1, len(ctruth3)), 4)
    finally:
        simsearch.PQ_SHORTLIST = saved_sl
    out["ann_clustered"]["ivfpq_trained"] = {
        "k": simsearch.IVF_TOPK,
        "nprobe": simsearch.IVF_NPROBE,
        "pq_m": simsearch.PQ_M, "pq_k": simsearch.PQ_K,
        "shortlist_default": simsearch.PQ_SHORTLIST,
        "recall_at_k_by_shortlist": tpq_sweep,
        "delta_vs_seeded_by_shortlist": {
            sl: round(tpq_sweep[sl] - pq_sweep[sl], 4)
            for sl in tpq_sweep},
        "note": ("emb_ivfpq_trained_topk: per-subspace Lloyd-trained "
                 "codebooks replacing the seeded literals, same probes "
                 "and re-rank. The delta column is the verdict-#3 "
                 "measurement: how much shortlist depth the trained "
                 "codebooks buy back at fixed recall"),
    }

    # ---- residual-trained IVF-PQ: the FAISS-form operating point ----
    rtq_sweep = {}
    saved_sl = simsearch.PQ_SHORTLIST
    try:
        for sl in (8, 16, 32, 64):
            simsearch.PQ_SHORTLIST = sl
            rtq = {(r.q_id, r.neighbor_id)
                   for r in simsearch
                   .emb_ivfpq_residual_trained_topk(spark, cdir)
                   .collect()}
            rtq_sweep[str(sl)] = round(
                len(rtq & ctruth3) / max(1, len(ctruth3)), 4)
    finally:
        simsearch.PQ_SHORTLIST = saved_sl
    out["ann_clustered"]["ivfpq_residual_trained"] = {
        "k": simsearch.IVF_TOPK,
        "nprobe": simsearch.IVF_NPROBE,
        "pq_m": simsearch.PQ_M, "pq_k": simsearch.PQ_K,
        "shortlist_default": simsearch.PQ_SHORTLIST,
        "recall_at_k_by_shortlist": rtq_sweep,
        "delta_vs_seeded_by_shortlist": {
            sl: round(rtq_sweep[sl] - pq_sweep[sl], 4)
            for sl in rtq_sweep},
        "delta_vs_trained_raw_by_shortlist": {
            sl: round(rtq_sweep[sl] - tpq_sweep[sl], 4)
            for sl in rtq_sweep},
        "note": ("emb_ivfpq_residual_trained_topk: residual encoding "
                 "with codebooks TRAINED on residuals — the FAISS "
                 "IVFPQ composition and the recommended operating "
                 "point. Completes the {seeded,trained}x{raw,residual} "
                 "2x2 (seeded-residual measured neutral in "
                 "BENCH/residual_adc.json)"),
    }

    # ---- dedup recall: LSH candidates vs exhaustive high-Jaccard ----
    exact = {(r.doc_a, r.doc_b): r.jaccard
             for r in dataops.docs_ngram_jaccard_pairs(spark, sf_dir)
             .collect()}
    lsh = {(r.doc_a, r.doc_b)
           for r in dataops.docs_jaccard_verify_candidates(spark, sf_dir)
           .collect()}
    dd = {}
    for thr in (0.2, 0.3, 0.5, 0.8):
        truth_pairs = {p for p, j in exact.items() if j >= thr}
        dd[str(thr)] = {
            "n_true_pairs": len(truth_pairs),
            "recall": (round(len(lsh & truth_pairs) / len(truth_pairs), 4)
                       if truth_pairs else None),
        }
    out["dedup"] = {"lsh_candidate_pairs": len(lsh),
                    "recall_by_jaccard_threshold": dd}

    print(json.dumps(out, indent=2))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "recall.json"), "w") as f:
        json.dump(out, f, indent=2)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
