from __future__ import annotations

import numpy as np
import pytest

from cs_insights_crawler_ray.functions.imagecodec import (
    decode_image,
    encode_image,
    hamming64,
    phash64,
    psnr,
)


def _img(seed=0, h=40, w=48):
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_png_roundtrip_lossless():
    img = _img(1)
    pix, fmt = decode_image(encode_image(img, "png"))
    assert fmt == "png"
    assert np.array_equal(pix, img)
    assert psnr(pix, img) == float("inf")


@pytest.mark.parametrize("fmt", ["jpeg", "webp"])
def test_lossy_psnr_above_gate(fmt):
    img = _img(2)
    pix, got = decode_image(encode_image(img, fmt))
    assert got == fmt
    assert pix.shape == img.shape
    assert 40.0 <= psnr(pix, img) < float("inf")


def test_corrupt_payload_raises():
    data = bytearray(encode_image(_img(3), "png"))
    with pytest.raises(ValueError):
        decode_image(bytes(data[:5]))
    data[0] = 0
    with pytest.raises(ValueError):
        decode_image(bytes(data))


def test_phash_near_dup_property():
    img = _img(4, 64, 64)
    lossy, _ = decode_image(encode_image(img, "jpeg"))
    other = _img(5, 64, 64)
    h0, h1, h2 = phash64(img), phash64(lossy), phash64(other)
    assert hamming64(h0, h1) <= 4          # re-encode = near dup
    assert hamming64(h0, h2) > 10          # unrelated image = far
    assert -(2**63) <= h0 < 2**63          # fits Arrow int64


def test_corrupt_zlib_body_raises_valueerror():
    """A well-headered blob with a bit-flipped zlib body must raise
    ValueError (zlib.error is NOT one) so the decode stage's
    poison-row handler catches it instead of the task dying."""
    data = bytearray(encode_image(_img(5), "png"))
    data[20] ^= 0xFF  # corrupt inside the compressed body
    with pytest.raises(ValueError):
        decode_image(bytes(data))


def test_psnr_no_int32_overflow_on_large_images():
    """SSE must accumulate in int64: a 257x257 max-diff pair has
    SSE ~ 1.3e10 > 2^31 — an int32 wrap yielded a bogus huge PSNR
    that let corrupt images pass the 40 dB verify gate."""
    import numpy as np

    from cs_insights_crawler_ray.functions.imagecodec import psnr

    a = np.zeros((257, 257, 3), np.uint8)
    b = np.full((257, 257, 3), 255, np.uint8)
    assert psnr(a, b) < 1.0  # exact: 10*log10(255^2/255^2) == 0


def test_zero_dimension_blob_is_corrupt():
    """A crafted blob with w=0/h=0 and a matching empty body must be
    rejected as corrupt (it previously decoded to a (0,0,3) array and
    ZeroDivisionError-crashed the feature kernels in the fused task)."""
    import struct
    import zlib

    from cs_insights_crawler_ray.functions.imagecodec import MAGIC

    blob = MAGIC + struct.pack("<BHH", 0, 0, 0) + zlib.compress(b"")
    with pytest.raises(ValueError):
        decode_image(blob)


def test_embedder_tiny_images_finite_unit_norm():
    """Decodable tiny images (1x1 .. 14x14) must produce finite
    unit-norm embeddings via deterministic edge-padding — the conv
    stack previously raised or emitted all-NaN vectors below 15px."""
    import numpy as np

    from cs_insights_crawler_ray.functions.imageembed import get_model

    m = get_model()
    for side in (1, 2, 7, 14, 15, 16):
        px = np.full((side, side, 3), 128, np.uint8)
        v = m.embed(px)
        assert np.isfinite(v).all(), side
        assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5, side


def test_embedder_skinny_and_large_rectangles():
    """The MIN_SIDE pad must apply AFTER the max-side pooling resize:
    a 20x200 image pools to 6x66 at f=3 (or 0xN pre-clamp) — pre-pad
    ordering left the original failure modes reachable for any image
    with long side > 96 and small short side."""
    import numpy as np

    from cs_insights_crawler_ray.functions.imageembed import get_model

    m = get_model()
    for h, w in [(20, 200), (200, 20), (32, 320), (16, 120), (1, 500), (500, 1)]:
        px = (np.arange(h * w * 3) % 251).astype(np.uint8).reshape(h, w, 3)
        v = m.embed(px)
        assert np.isfinite(v).all(), (h, w)
        assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-4, (h, w)
