

def test_wav_roundtrip_and_error_path(spark):
    from mobsos_event_log_generator_spark.operators.multimodal import (
        audio_features,
        decode_wav,
        encode_wav_pcm16,
    )

    samples = [0, 100, -100, 32767, -32768, 7]
    wav = encode_wav_pcm16(samples, sample_rate=16000)
    out = decode_wav(wav)
    assert out["samples"] == samples and out["sample_rate"] == 16000 and out["n_channels"] == 1

    # stereo: interleaved frames, frame count = len/2
    st = encode_wav_pcm16([1, 2, 3, 4], sample_rate=8000, n_channels=2)
    assert decode_wav(st)["n_channels"] == 2

    rows = [(1, bytearray(wav)), (2, bytearray(b"not audio")), (3, bytearray(st))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in audio_features(df).collect()}
    assert got[1]["n_samples"] == 6 and got[1]["sum_sq"] == sum(x * x for x in samples)
    assert got[1]["peak_abs"] == 32768 and got[1]["duration_ms"] == 6 * 1000 // 16000
    assert got[1]["error"] is None
    assert got[2]["error"] is not None and got[2]["n_samples"] is None
    assert got[3]["n_samples"] == 2  # frames, not raw sample count


def test_mvid_container_roundtrip():
    from mobsos_event_log_generator_spark.operators.multimodal import decode_mvid, encode_mvid

    frames = [b"abc", b"", b"\x00\x01\x02\x03" * 10]
    assert decode_mvid(encode_mvid(frames)) == frames
    import pytest

    with pytest.raises(ValueError):
        decode_mvid(b"NOPE" + b"\x00" * 8)
    with pytest.raises(ValueError):
        decode_mvid(encode_mvid(frames) + b"junk")


def test_video_keyframes_semantics(spark):
    from mobsos_event_log_generator_spark.operators.multimodal import (
        encode_mvid,
        encode_png_gray,
        video_keyframes,
    )

    # frame sums: 0, 0, 16*256=4096, 4351 -> keyframes at 0 (first),
    # 2 (delta 4096 >= 256); frame 1 (delta 0) and 3 (delta 255) are not.
    f0 = bytes(256)
    f1 = bytes(256)
    f2 = bytes([16] * 256)
    f3 = bytes([17] * 255 + [16])  # sum 4351: delta 255 < threshold
    payload = encode_mvid([encode_png_gray(f, 16, 16) for f in (f0, f1, f2, f3)])
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    out = {r["frame_idx"]: r for r in video_keyframes(df, luma_sum_threshold=256).collect()}
    assert [out[i]["is_keyframe"] for i in range(4)] == [True, False, True, False]
    assert out[0]["mean_luma"] == 0.0
    assert out[2]["mean_luma"] == 16.0


def test_ahash_brightness_invariance_and_dups(spark):
    """aHash is invariant to uniform brightness scaling (above-mean pattern
    unchanged) and identical for exact duplicate images."""
    from mobsos_event_log_generator_spark.operators.multimodal import (
        ahash_images,
        encode_png_gray,
    )

    base = bytes([(r * 16 + c) % 37 * 6 for r in range(16) for c in range(16)])
    brighter = bytes(min(255, b + 40) for b in base)  # uniform shift
    rows = [
        (1, bytearray(encode_png_gray(base, 16, 16))),
        (2, bytearray(encode_png_gray(base, 16, 16))),      # exact dup
        (3, bytearray(encode_png_gray(brighter, 16, 16))),  # brightness shift
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: (r["ahash_hi"], r["ahash_lo"]) for r in ahash_images(df).collect()}
    assert out[1] == out[2]
    hi1, lo1 = out[1]
    hi3, lo3 = out[3]
    ham = bin((hi1 ^ hi3) & 0xFFFFFFFF).count("1") + bin((lo1 ^ lo3) & 0xFFFFFFFF).count("1")
    assert ham <= 8  # shifted copy stays within a small hamming radius
