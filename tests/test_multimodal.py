"""Multimodal plumbing: decode metadata, resize resampling, frame sampling.

The codec byte->pixel step is the documented deterministic stub; these tests
pin the REAL parts — Arrow batch schemas, the nearest-neighbour resample
math (vs a numpy reference), normalization, frame timestamp grids, and
determinism across runs.
"""

import numpy as np

from networkit_spark.functions.multimodal import (
    _fake_decode_pixels,
    _nn_resize,
    attach_binary,
    decode_images,
    resize_images,
    sample_frames,
)


def _docs(spark):
    rows = [(i, "text payload number %d " % i * (i + 1)) for i in range(8)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decode_schema_and_determinism(spark):
    out = decode_images(attach_binary(_docs(spark))).orderBy("doc_id")
    a = out.collect()
    b = decode_images(attach_binary(_docs(spark))).orderBy("doc_id").collect()
    assert a == b
    assert [f.name for f in out.schema.fields] == ["doc_id", "n_bytes", "width", "height"]
    for r in a:
        assert 64 <= r["width"] < 192 and 64 <= r["height"] < 192


def test_nn_resize_matches_numpy_reference():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, size=(37, 91), dtype=np.uint8)
    got = _nn_resize(img, 16)
    rows = np.minimum((np.arange(16) * 37) // 16, 36)
    cols = np.minimum((np.arange(16) * 91) // 16, 90)
    want = img[np.ix_(rows, cols)]
    assert (got == want).all()


def test_resize_images_end_to_end(spark):
    out = resize_images(attach_binary(_docs(spark)), target=8).orderBy("doc_id")
    rows = out.collect()
    assert len(rows) == 8
    for r in rows:
        assert len(r["pixels"]) == 64
        assert 0.0 <= r["mean_gray"] <= 1.0
        # mean_gray consistent with the emitted pixel vector
        assert abs(float(np.mean(r["pixels"])) - r["mean_gray"]) < 1e-5
        # pixels reproduce the driver-side decode+resize on the same payload
        payload = ("text payload number %d " % r["doc_id"]) * (r["doc_id"] + 1)
        img = _fake_decode_pixels(payload.encode("utf-8"))
        want = (_nn_resize(img, 8).astype(np.float32) / 255.0).ravel()
        assert np.allclose(np.array(r["pixels"], dtype=np.float32), want, atol=1e-6)


def test_sample_frames_grid_and_hash_determinism(spark):
    out = sample_frames(attach_binary(_docs(spark)), fps=2.0, duration_s=3.0)
    rows = out.orderBy("doc_id", "frame_idx").collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, fr in per_doc.items():
        assert len(fr) == 6  # 3s at 2 fps
        assert [f["frame_idx"] for f in fr] == list(range(6))
        assert [f["ts_sec"] for f in fr] == [i / 2.0 for i in range(6)]
    again = sample_frames(attach_binary(_docs(spark)), fps=2.0, duration_s=3.0)
    assert rows == again.orderBy("doc_id", "frame_idx").collect()


def test_canonical_docs_elects_min_per_cluster(spark):
    from networkit_spark.functions.dedup import canonical_docs

    # two chains: {a,b,c} via a-b, b-c; {x,y}; singleton pairs absent
    pairs = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("x", "y")], "id_a string, id_b string"
    )
    got = {
        r["id"]: r["canonical"] for r in canonical_docs(pairs, rounds=4).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def _pnm_bytes(kind: bytes, w: int, h: int, vals: bytes) -> bytes:
    return kind + b"\n# comment\n" + f"{w} {h}\n255\n".encode() + vals


def test_pnm_real_decode_p5_and_p6(spark):
    import numpy as np

    from networkit_spark.functions.multimodal import _parse_pnm, decode_images

    p5 = _pnm_bytes(b"P5", 3, 2, bytes([0, 50, 100, 150, 200, 250]))
    img = _parse_pnm(p5)
    assert img.shape == (2, 3)
    assert img.tolist() == [[0, 50, 100], [150, 200, 250]]

    # P6 RGB averages channels
    p6 = _pnm_bytes(b"P6", 1, 1, bytes([30, 60, 90]))
    img6 = _parse_pnm(p6)
    assert img6.shape == (1, 1) and img6[0, 0] == 60

    assert _parse_pnm(b"JFIFnotpnm") is None

    df = spark.createDataFrame(
        [(0, bytearray(p5), "image/x-portable-graymap")],
        "doc_id long, payload binary, media_type string",
    )
    got = decode_images(df).collect()[0]
    assert (got["width"], got["height"]) == (3, 2)


def test_resize_pnm_exact_pixels(spark):
    from networkit_spark.functions.multimodal import resize_images

    # 2x2 image resized to 2 -> identity
    p5 = _pnm_bytes(b"P5", 2, 2, bytes([0, 255, 255, 0]))
    df = spark.createDataFrame(
        [(7, bytearray(p5), "image/x-portable-graymap")],
        "doc_id long, payload binary, media_type string",
    )
    r = resize_images(df, target=2).collect()[0]
    assert r["pixels"] == [0.0, 1.0, 1.0, 0.0]
    assert abs(r["mean_gray"] - 0.5) < 1e-6


def test_wav_real_decode(spark):
    import io
    import math
    import wave

    import numpy as np

    buf = io.BytesIO()
    sr = 8000
    x = np.array(
        [int(20000 * math.sin(2 * math.pi * 440 * i / sr)) for i in range(800)],
        dtype="<i2",
    )
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(x.tobytes())

    from networkit_spark.functions.multimodal import decode_audio

    df = spark.createDataFrame(
        [(1, bytearray(buf.getvalue()), "audio/wav"),
         (2, bytearray(b"not a wav"), "audio/unknown")],
        "doc_id long, payload binary, media_type string",
    )
    got = {r["doc_id"]: r for r in decode_audio(df).collect()}
    assert got[1]["sample_rate"] == sr and got[1]["n_samples"] == 800
    assert abs(got[1]["duration_s"] - 0.1) < 1e-9
    ref_rms = float(np.sqrt(np.mean((x.astype(np.float64) / 32768.0) ** 2)))
    assert abs(got[1]["rms"] - ref_rms) < 1e-12
    assert got[2]["sample_rate"] == -1  # honest fallback flag
