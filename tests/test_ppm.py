"""Real PPM (P6) codec tier (operators/multimodal.py:decode_ppm): pure
round-trips pin the header tokenizer and raster offset; the Spark-side
query parity is covered by the ppm_image_features oracle row."""

from __future__ import annotations

import numpy as np
import pytest

from hnsw_spark.operators.multimodal import (
    decode_image,
    decode_ppm,
    ppm_image_features,
    synthetic_ppm_media,
)


def _ppm_bytes(img: np.ndarray, header: str | None = None) -> bytes:
    h, w, _ = img.shape
    head = header if header is not None else f"P6\n{w} {h}\n255\n"
    return head.encode("ascii") + img.astype(np.uint8).tobytes()


def test_decode_ppm_roundtrip():
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    out = decode_ppm(_ppm_bytes(img))
    assert out.shape == (2, 3, 3)
    assert out.tolist() == img.tolist()


def test_decode_ppm_skips_comments_and_odd_whitespace():
    img = np.full((4, 2, 3), 200, dtype=np.uint8)
    header = "P6\n# a comment\n#another\n 2\t4 # trailing\n255 "
    out = decode_ppm(_ppm_bytes(img, header=header))
    assert out.shape == (4, 2, 3)
    assert int(out.sum()) == 4 * 2 * 3 * 200


def test_decode_ppm_raster_starts_after_single_whitespace():
    # a raster whose FIRST byte is whitespace-valued (0x0A) must not be
    # consumed by header parsing
    img = np.full((1, 2, 3), 0x0A, dtype=np.uint8)
    out = decode_ppm(_ppm_bytes(img))
    assert out.tolist() == img.tolist()


def test_decode_ppm_rejects_non_p6_and_16bit():
    with pytest.raises(ValueError):
        decode_ppm(b"P3\n1 1\n255\n0 0 0")
    img = np.zeros((1, 1, 3), dtype=np.uint8)
    with pytest.raises(ValueError):
        decode_ppm(_ppm_bytes(img, header="P6\n1 1\n65535\n"))


def test_decode_image_dispatches_p6():
    img = np.arange(12, dtype=np.uint8).reshape(1, 4, 3)
    out = decode_image(_ppm_bytes(img), width=4, height=1)
    assert out.tolist() == img.tolist()  # real decode, not the stub stream


def test_ppm_features_spark_parity(spark):
    media = synthetic_ppm_media(spark, count=4, width=8, height=6)
    rows = {r["media_id"]: r for r in ppm_image_features(media).collect()}
    assert sorted(rows) == [0, 1, 2, 3]
    local = {
        r["media_id"]: r["payload"]
        for r in media.select("media_id", "payload").collect()
    }
    for mid, payload in local.items():
        img = decode_ppm(bytes(payload))
        assert (rows[mid]["height"], rows[mid]["width"]) == img.shape[:2] == (6, 8)
        assert rows[mid]["pixel_sum"] == int(img.astype(np.int64).sum())
        assert len(rows[mid]["embedding"]) == 64


from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    w=st.integers(1, 9),
    h=st.integers(1, 9),
    data=st.data(),
    comment=st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_decode_ppm_property_roundtrip(w, h, data, comment):
    # ANY uint8 raster survives the container round-trip bit-exactly,
    # with or without header comments — including rasters whose leading
    # bytes are whitespace or '#' values
    body = data.draw(
        st.lists(
            st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3
        )
    )
    img = np.array(body, dtype=np.uint8).reshape(h, w, 3)
    head = f"P6\n#c\n{w} {h}\n255\n" if comment else f"P6 {w} {h} 255\n"
    out = decode_ppm(head.encode("ascii") + img.tobytes())
    assert out.shape == (h, w, 3)
    assert out.tolist() == img.tolist()
