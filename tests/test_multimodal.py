"""Multimodal-column plumbing tests: codec sniffing, the deterministic
decode stub, frame sampling, and the Spark-side mapInPandas shapes."""
import pytest

from pdfi_spark.ops.multimodal import (
    N_FEATURES,
    decode_media,
    fake_decode_features,
    frame_sample_offsets,
    media_feature_summary,
    media_features,
    media_metadata,
    sniff_codec,
)

SF = "/root/testdata/sf0.001"


def test_sniff_codec_magic_bytes():
    assert sniff_codec(b"%PDF-1.4 ...") == ("pdf", "document")
    assert sniff_codec(b"\x89PNG\r\n\x1a\n...") == ("png", "image")
    assert sniff_codec(b"\xff\xd8\xff\xe0JFIF") == ("jpeg", "image")
    assert sniff_codec(b"GIF89a") == ("gif", "image")
    assert sniff_codec(b"RIFF....WAVE") == ("riff", "audio")
    assert sniff_codec(b"ID3\x03") == ("mp3", "audio")
    assert sniff_codec(b"\x1a\x45\xdf\xa3segment") == ("mkv", "video")
    assert sniff_codec(b"plain text") == ("unknown", "unknown")


def test_decode_media_is_an_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG", "png")


def test_fake_decode_features_deterministic():
    payload = bytes(range(80))
    feats = fake_decode_features(payload)
    assert len(feats) == N_FEATURES
    assert feats == fake_decode_features(payload)
    assert all(0.0 <= f <= 1.0 for f in feats)
    # stride = 10; first chunk = bytes 0..9 -> mean 4.5 / 255
    assert feats[0] == sum(range(10)) / 10 / 255.0
    assert fake_decode_features(b"") == [0.0] * N_FEATURES


def test_frame_sample_offsets():
    assert frame_sample_offsets(100) == [0, 25, 50, 75]
    assert frame_sample_offsets(3) == [0, 0, 1, 2]
    assert frame_sample_offsets(0) == []


def test_media_metadata_spark(spark):
    pdf = media_metadata(spark, SF).toPandas()
    assert len(pdf) == 500
    assert (pdf["codec"] == "unknown").all()  # text payloads: no magic
    assert (pdf["n_bytes"] > 0).all()
    assert pdf["magic_hex"].str.len().eq(8).all()


def test_media_features_spark(spark):
    feats = media_features(spark, SF)
    assert [f.simpleString() for f in feats.schema.fields] == [
        "doc_id:bigint", "modality:string", "features:array<double>",
        "frame_offsets:array<int>",
    ]
    pdf = feats.toPandas()
    assert len(pdf) == 500
    assert pdf["features"].map(len).eq(N_FEATURES).all()
    assert pdf["frame_offsets"].map(len).eq(4).all()

    # cross-check one row against the pure-python stub
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(1).collect()[0]
    expected = fake_decode_features(docs["text"].encode("utf-8"))
    row = pdf[pdf["doc_id"] == docs["doc_id"]].iloc[0]
    assert list(row["features"]) == pytest.approx(expected)


def test_media_feature_summary_spark(spark):
    pdf = media_feature_summary(spark, SF).toPandas()
    assert set(pdf.columns) == {"doc_id", "f0", "n_frames", "frame1_offset"}
    assert (pdf["n_frames"] == 4).all()


def test_fake_resize_edges():
    from pdfi_spark.ops.multimodal import RESIZE_TARGET, fake_resize

    assert fake_resize(b"") == b""
    # payload shorter than target: stride 1, whole payload kept
    assert fake_resize(b"abc") == b"abc"
    # long payload subsamples down to exactly RESIZE_TARGET bytes
    out = fake_resize(bytes(range(200)))
    assert len(out) == RESIZE_TARGET
    assert out[0] == 0 and out[1] == 200 // RESIZE_TARGET
