"""Multimodal plumbing: FKIM codec round trip, error capture, resize."""

import struct

from ocr_spark.operators.multimodal import (
    FRAME_BYTES, HEADER_BYTES, decode_media_meta, encode_media, frame_content,
    media_dims, resize_stub, sample_frames, synthesize_media,
)


def test_codec_round_trip_pure():
    for doc_id in (0, 1, 7, 123, 4999):
        data = encode_media(doc_id)
        w, h, nf = media_dims(doc_id)
        assert data[:4] == b"FKIM"
        assert struct.unpack(">BHHB", data[4:HEADER_BYTES]) == (1, w, h, nf)
        assert len(data) == HEADER_BYTES + nf * FRAME_BYTES
        assert data[HEADER_BYTES:HEADER_BYTES + FRAME_BYTES] == \
            frame_content(doc_id, 0)


def test_spark_decode_and_sample(spark):
    docs = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    media = synthesize_media(docs)
    meta = {r.doc_id: r for r in decode_media_meta(media).collect()}
    assert len(meta) == 20
    for i in range(20):
        w, h, nf = media_dims(i)
        assert (meta[i].width, meta[i].height, meta[i].n_frames) == (w, h, nf)
        assert meta[i].error is None
    frames = sample_frames(media, every_k=2).collect()
    expected = sum((media_dims(i)[2] + 1) // 2 for i in range(20))
    assert len(frames) == expected


def test_decode_error_is_row_not_failure(spark):
    rows = [(1, bytearray(b"NOTFKIM_GARBAGE")), (2, bytearray(b"FKIM\x01"))]
    media = spark.createDataFrame(rows, "doc_id long, media binary")
    out = {r.doc_id: r for r in decode_media_meta(media).collect()}
    assert out[1].error is not None and "bad magic" in out[1].error
    assert out[2].error is not None
    assert out[1].width is None


def test_resize_restamps_header(spark):
    docs = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    media = synthesize_media(docs)
    resized = resize_stub(media, 32, 48)
    meta = {r.doc_id: r for r in decode_media_meta(resized).collect()}
    for i in range(5):
        assert (meta[i].width, meta[i].height) == (32, 48)
        assert meta[i].n_frames == media_dims(i)[2]
        assert meta[i].error is None


def test_phash_near_dup_pairs_are_same_scene(spark):
    """Every emitted pair is a true re-encode pair (same scene class),
    Hamming ≤ the threshold and ≤ 4 (two flips per side), pairs from
    DIFFERENT scenes never appear, and the bucket cap sits below the
    self-join exactly like the SimHash path."""
    import re

    from tests.test_plans import SF

    from ocr_spark.plans.multimodal_queries import (
        PHASH_MAX_HAM, PHASH_SCENES, mm_phash_near_dup)

    df = mm_phash_near_dup(spark, SF)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "bucket_n" in plan
    cap = re.search(r"bucket_n#\d+L? <=", plan)
    assert cap and plan.index("Join") < cap.start()

    rows = df.collect()
    assert rows
    for r in rows:
        assert r["doc_a"] % PHASH_SCENES == r["doc_b"] % PHASH_SCENES
        assert 0 <= r["hamming"] <= min(4, PHASH_MAX_HAM)


def test_scene_cuts_fire_and_pairs_are_consecutive(spark):
    """Scene cuts must genuinely fire on the fixture (threshold sits
    inside the measured cosine spread), every pair must be a
    consecutive sampled-frame pair (frame_b = frame_a + stride), and
    the verdict must equal the thresholded cosine."""
    from ocr_spark.plans.multimodal_queries import (
        SCENE_CUT_COS, mm_scene_cuts)

    rows = mm_scene_cuts(spark, "/root/testdata/sf0.01").collect()
    assert rows
    n_cut = 0
    for r in rows:
        assert r["frame_b"] == r["frame_a"] + 2   # every_k=2 stride
        assert -1.0 <= r["cos_sim"] <= 1.0
        assert r["is_cut"] == (r["cos_sim"] < SCENE_CUT_COS)
        n_cut += r["is_cut"]
    assert 0 < n_cut < len(rows)


def test_vad_hysteresis_state_machine_replay(spark):
    """Pure-Python replay of the hysteresis walk from the same
    modeled energies matches segment for segment; segments never
    overlap, respect the min-duration filter, and every emitted
    segment ENTERED at >= VAD_HI and survived until a frame below
    VAD_LO (or clip end) — the two-threshold property that
    distinguishes VAD from naive thresholding."""
    import hashlib
    from collections import defaultdict

    from ocr_spark.plans.multimodal_queries import (
        _VAD_FRAMES, VAD_HI, VAD_LO, VAD_MIN_FRAMES, mm_audio_vad)

    rows = mm_audio_vad(spark, "/root/testdata/sf0.01").collect()
    got = defaultdict(list)
    for r in rows:
        got[r.doc_id].append(
            (r.seg_start, r.seg_end, r.n_frames, r.sum_energy))

    def energy(d, f):
        h = hashlib.md5(f"{d}_{f}:e".encode()).hexdigest()
        e = int(h[:4], 16) % 500
        if d % 3 == 0 and d % 4 <= f < d % 4 + 3:
            e += 700
        return e

    import duckdb
    ids = [i for (i,) in duckdb.sql(
        "SELECT doc_id FROM read_parquet("
        "'/root/testdata/sf0.01/documents.parquet')").fetchall()]
    want = defaultdict(list)
    for d in ids:
        n = 1 + d % _VAD_FRAMES
        in_speech, start, acc = False, -1, 0
        segs = []
        for f in range(n):
            e = energy(d, f)
            if not in_speech and e >= VAD_HI:
                in_speech, start, acc = True, f, e
            elif in_speech and e < VAD_LO:
                segs.append((start, f, f - start, acc))
                in_speech = False
            elif in_speech:
                acc += e
        if in_speech:
            segs.append((start, n, n - start, acc))
        want[d] = [s for s in segs if s[2] >= VAD_MIN_FRAMES]
    assert dict(got) == {d: s for d, s in want.items() if s}
    for d, segs in got.items():
        segs.sort()
        for (s1, e1, *_), (s2, _, *_) in zip(segs, segs[1:]):
            assert s2 >= e1   # no overlap
        for s, e, n, _ in segs:
            assert n == e - s >= VAD_MIN_FRAMES
