

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
