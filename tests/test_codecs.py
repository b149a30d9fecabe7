"""Vendored PPM/BMP codec round-trip properties (hypothesis fuzz) —
these decoders gate the real-codec branch of the multimodal kernels,
so their correctness is what makes that branch trustworthy."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from metevents_spark.multimodal.codecs import (
    decode_image,
    encode_bmp,
    encode_ppm,
    resize_nearest,
)


@st.composite
def images(draw):
    h = draw(st.integers(min_value=1, max_value=13))
    w = draw(st.integers(min_value=1, max_value=13))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    return np.random.RandomState(seed).randint(
        0, 256, (h, w, 3), dtype=np.uint8
    )


@settings(max_examples=50, deadline=None)
@given(images())
def test_ppm_round_trip(img):
    assert (decode_image(encode_ppm(img)) == img).all()


@settings(max_examples=50, deadline=None)
@given(images())
def test_bmp_round_trip(img):
    # odd widths exercise the 4-byte row padding; the flip exercises
    # bottom-up row order
    assert (decode_image(encode_bmp(img)) == img).all()


@settings(max_examples=30, deadline=None)
@given(images(), st.integers(min_value=1, max_value=9),
       st.integers(min_value=1, max_value=9))
def test_resize_shape_and_palette(img, tw, th):
    out = resize_nearest(img, tw, th)
    assert out.shape == (th, tw, 3)
    # nearest-neighbor only ever samples existing pixels
    src = {tuple(p) for row in img for p in row}
    assert all(tuple(p) in src for row in out for p in row)


def test_ppm_comments_and_whitespace():
    img = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    payload = b"P6\n# a comment\n2 2\n# another\n255\n" + img.tobytes()
    assert (decode_image(payload) == img).all()
