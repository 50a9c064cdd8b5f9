"""Multimodal plumbing: schema, batch shape, determinism (decode is stubbed —
the deterministic fake decoder exercises the real Spark-side contract)."""

from __future__ import annotations

import pytest

from bigtrees_spark.operators.multimodal import (
    MEDIA_META_SCHEMA,
    RESIZED_SCHEMA,
    decode_image,
    drop_payload,
    extract_media_features,
    fake_decode,
    frame_sample_plan,
    resize_images,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [(f"img://{i}", bytes([i % 256]) * (100 + 37 * i)) for i in range(20)]
    rows.append(("img://empty", b""))
    return spark.createDataFrame(rows, "url string, payload binary").cache()


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_fake_decode_deterministic():
    a = fake_decode(b"payload")
    b = fake_decode(b"payload")
    assert a[0] == b[0] and a[1] == b[1] and (a[2] == b[2]).all()


def test_extract_media_features_schema_and_rows(media):
    out = extract_media_features(media)
    assert out.schema == MEDIA_META_SCHEMA
    rows = out.collect()
    assert len(rows) == media.count()
    by_url = {r.url: r for r in rows}
    assert by_url["img://empty"].n_bytes == 0
    assert all(len(r.feature) == 8 for r in rows)
    assert all(r.width >= 1 and r.height >= 1 for r in rows)
    # content digest matches hashlib on the driver
    import hashlib

    src = {r.url: bytes(r.payload) for r in media.collect()}
    for u, r in by_url.items():
        assert r.content_sha256 == hashlib.sha256(src[u]).hexdigest()


def test_extract_deterministic_across_runs(media):
    a = {r.url: r.feature for r in extract_media_features(media).collect()}
    b = {r.url: r.feature for r in extract_media_features(media.repartition(5)).collect()}
    assert a == b


def test_frame_sample_plan(media):
    out = frame_sample_plan(media, every_n_bytes=64)
    rows = out.where("url = 'img://3'").collect()
    # payload of url img://3 is 100+37*3 = 211 bytes -> offsets 0,64,128,192
    assert [r.offset for r in sorted(rows, key=lambda r: r.frame_idx)] == [0, 64, 128, 192]
    assert "payload" not in out.columns


def test_drop_payload(media):
    assert "payload" not in drop_payload(media).columns


def test_resize_images_schema_dims_and_determinism(media):
    out = resize_images(media, 32, 16)
    assert out.schema == RESIZED_SCHEMA
    rows = out.collect()
    assert len(rows) == media.count()
    assert all(r.width == 32 and r.height == 16 for r in rows)
    assert all(len(bytes(r.payload)) > 0 for r in rows)
    # deterministic across partitioning AND keyed by target dims
    again = {r.url: bytes(r.payload) for r in resize_images(media.repartition(7), 32, 16).collect()}
    assert {r.url: bytes(r.payload) for r in rows} == again
    other = {r.url: bytes(r.payload) for r in resize_images(media, 64, 64).collect()}
    assert all(other[u] != p for u, p in again.items())


def test_decode_image_guard_without_pil():
    """No PIL in this container: the real decoder must fail loudly as a
    declared environment stub, never silently fake."""
    import pytest

    from bigtrees_spark.operators.multimodal import decode_image

    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present: covered by test_real_decoder_with_pil")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG fake")


def test_real_decoder_with_pil(spark):
    """Where PIL exists, use_fake_decoder=False runs the REAL decode/resize
    kernels end-to-end through the same mapInPandas plumbing (closes SURVEY
    §2.11e wherever the environment allows; skipped in containers without
    image libraries)."""
    import io

    import pytest

    PIL = pytest.importorskip("PIL")
    from PIL import Image

    from bigtrees_spark.operators.multimodal import extract_media_features, resize_images

    def png(w, h, val):
        img = Image.new("L", (w, h), val)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    rows = [("img/a", png(10, 6, 0)), ("img/b", png(4, 8, 255))]
    df = spark.createDataFrame(rows, "url string, payload binary")
    feats = {r.url: r for r in extract_media_features(df, use_fake_decoder=False).collect()}
    assert (feats["img/a"].width, feats["img/a"].height) == (10, 6)
    assert (feats["img/b"].width, feats["img/b"].height) == (4, 8)
    # uniform-0 image: all mass in the first histogram bin
    assert feats["img/a"].feature[0] == pytest.approx(1.0)
    assert feats["img/b"].feature[-1] == pytest.approx(1.0)

    resized = resize_images(df, 5, 3, use_fake_decoder=False).collect()
    for r in resized:
        img = Image.open(io.BytesIO(bytes(r.payload)))
        assert img.size == (5, 3)
