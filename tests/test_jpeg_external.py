"""External JPEG conformance: decode the committed golden synth
JPEGs with PIL/libjpeg WHEN IMPORTABLE and compare against the
in-engine decoder (r10 verdict keep-honest item: the synth encoder
has no library validator in this container — PNG's deflate is
zlib-validated, JPEG has no counterpart here).

Two layers:

1. Golden-byte pins (always run): the synth encoders must reproduce
   the committed fixture bytes exactly, so any byte-layout drift in
   the encoder is caught in-sandbox even without a JPEG library. The
   fixtures cover grayscale (with and without restart markers) and
   all three color subsampling variants (4:4:4 / 4:2:2 / 4:2:0,
   restart and non-restart).
2. Library cross-decode (skipped when PIL is absent — this
   container): libjpeg must accept every fixture as a valid JPEG
   with the right dims/mode, and its pixel output must agree with
   ``decode_jpeg_pixels`` within decoder-variance tolerances
   (T.81 lets IDCT implementations differ by a few levels; chroma
   UPSAMPLING FILTERS legitimately differ — libjpeg's default is a
   triangle filter, ours is replication — so subsampled variants
   compare the luma reconstruction and per-channel means, not raw
   RGB). On any environment upgrade that brings PIL, this closes the
   encoder-validation gap automatically.
"""

from __future__ import annotations

import io
from pathlib import Path

import numpy as np
import pytest

from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.functions import jpeg as J

GOLDEN = Path(__file__).parent / "golden"
GRAY_IDS = (0, 5)  # 5: restart markers (8-bit — PIL cross-decodable)
GRAY12_IDS = (10,)  # 12-bit SOF1 + restarts: byte-pin only (stock
# libjpeg is built for 8-bit samples, so no PIL cross-decode)
COLOR_IDS = (6, 7, 11, 15)  # 4:4:4, 4:2:2, 4:2:0, 4:4:4+restart
PROG_IDS = (6, 7, 11, 15)  # same variants, progressive 9-scan script


def test_golden_bytes_pin_the_synth_encoders():
    for mid in GRAY_IDS + GRAY12_IDS:
        want = (GOLDEN / f"gray_{mid}.jpg").read_bytes()
        assert J.synth_jpeg_bytes(mid) == want, mid
    for mid in COLOR_IDS:
        want = (GOLDEN / f"color_{mid}.jpg").read_bytes()
        assert J.synth_color_jpeg_bytes(mid) == want, mid
    for mid in PROG_IDS:
        want = (GOLDEN / f"prog_{mid}.jpg").read_bytes()
        assert J.synth_progressive_jpeg_bytes(mid) == want, mid
    # the 12-bit fixture really is SOF1/precision-12 on the wire and
    # coefficient-decodes in-engine
    pay = (GOLDEN / "gray_10.jpg").read_bytes()
    assert b"\xff\xc1" in pay and pay[pay.index(b"\xff\xc1") + 4] == 12
    assert J.decode_jpeg_coefficients(pay) is not None


def _pil_image(payload: bytes):
    Image = pytest.importorskip("PIL.Image")
    return Image.open(io.BytesIO(payload))


def test_libjpeg_accepts_and_matches_grayscale():
    for mid in GRAY_IDS:
        payload = (GOLDEN / f"gray_{mid}.jpg").read_bytes()
        im = _pil_image(payload)
        ours = J.decode_jpeg_pixels(payload)
        lib = np.asarray(im.convert("L"), dtype=np.int16)
        assert lib.shape == ours.shape, mid
        # IDCT implementations may differ by a couple of levels
        assert np.abs(lib - ours.astype(np.int16)).max() <= 2, mid


def test_libjpeg_accepts_and_matches_color_444():
    for mid in COLOR_IDS:
        if mid % 3 != 0:
            continue  # 4:4:4 only: no upsampling-filter variance
        payload = (GOLDEN / f"color_{mid}.jpg").read_bytes()
        im = _pil_image(payload)
        ours = J.decode_jpeg_pixels(payload)
        lib = np.asarray(im.convert("RGB"), dtype=np.int16)
        assert lib.shape == ours.shape, mid
        # IDCT variance + fixed-point vs float color conversion
        assert np.abs(lib - ours.astype(np.int16)).max() <= 4, mid


def test_libjpeg_accepts_and_matches_progressive():
    """libjpeg must accept the progressive fixtures (multi-scan SOF2
    with per-scan tables, restarts, band splits and successive
    approximation) and — since both decoders reassemble the SAME
    coefficient planes — its pixels must agree within the same
    variance budgets as the baseline fixtures (4:4:4 raw RGB;
    subsampled variants via luma + per-channel means)."""
    for mid in PROG_IDS:
        payload = (GOLDEN / f"prog_{mid}.jpg").read_bytes()
        im = _pil_image(payload)
        ours = J.decode_jpeg_pixels(payload)
        lib = np.asarray(im.convert("RGB"), dtype=np.float64)
        assert lib.shape == ours.shape, mid
        if mid % 3 == 0:  # 4:4:4: no upsampling-filter variance
            assert np.abs(lib - ours.astype(np.float64)).max() <= 4, mid
            continue
        w = np.array([0.299, 0.587, 0.114])
        assert np.abs(lib @ w - ours.astype(np.float64) @ w).max() <= 4, mid
        for ch in range(3):
            assert abs(lib[..., ch].mean() - ours[..., ch].mean()) <= 3, (
                mid, ch,
            )


def test_libjpeg_matches_subsampled_luma_and_means():
    """4:2:2 / 4:2:0: raw RGB legitimately differs (triangle vs
    replication chroma upsampling), but the luma reconstruction
    0.299R + 0.587G + 0.114B recovers the shared Y plane, and the
    per-channel image means must agree closely."""
    for mid in COLOR_IDS:
        if mid % 3 == 0:
            continue
        payload = (GOLDEN / f"color_{mid}.jpg").read_bytes()
        im = _pil_image(payload)
        ours = J.decode_jpeg_pixels(payload).astype(np.float64)
        lib = np.asarray(im.convert("RGB"), dtype=np.float64)
        assert lib.shape == ours.shape, mid
        w = np.array([0.299, 0.587, 0.114])
        y_lib = lib @ w
        y_ours = ours @ w
        assert np.abs(y_lib - y_ours).max() <= 4, mid
        for ch in range(3):
            assert abs(lib[..., ch].mean() - ours[..., ch].mean()) <= 3, (
                mid, ch,
            )
