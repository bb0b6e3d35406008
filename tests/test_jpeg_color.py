"""Multi-component (color) baseline-JPEG codec tests
(functions/jpeg.py, r11).

Same doctrine as test_jpeg_codec.py: the encoder exists to synthesize
gate fixtures; the decoder is the product. Compliance is pinned by
exact integer coefficient round-trips over Hypothesis-drawn sampling
layouts / dims / blocks / restart intervals, a literal re-derivation
of the IDCT + replication-upsample + JFIF color-conversion pixel
path, and structural rejection tests. The skip-if-absent external
conformance test lives in test_jpeg_external.py.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import assume, given, settings, strategies as st

from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.functions import jpeg as J


def _want_blocks(mid: int, c: int, n: int, quant):
    return [
        {p: v * quant(p) for p, v in J.block_coefficients(mid * 3 + c, k).items()}
        for k in range(n)
    ]


def test_color_formula_roundtrip_exact_including_restart_ids():
    """Every subsampling variant (id%3), every MCU grid (1..2 x 1..2),
    padded dims, and the restart ids (id%20 == 15) round-trip to the
    exact dequantized formula coefficients."""
    for mid in list(range(80)) + [123, 1234, 99999, 10**6, 10**7 + 3]:
        payload = J.synth_color_jpeg_bytes(mid)
        dec = J.decode_jpeg_components(payload)
        assert dec is not None, mid
        w, h, comps = dec
        hy, vy = J.color_sampling(mid)
        width, height, mcux, mcuy = J.color_geometry(mid)
        assert (w, h) == (width, height), mid
        assert [c[1:3] for c in comps] == [(hy, vy), (1, 1), (1, 1)], mid
        assert [c[0] for c in comps] == [1, 2, 3], mid
        for c, (_, ch_, cv_, blocks) in enumerate(comps):
            n = mcux * ch_ * mcuy * cv_
            quant = J.quant_table_value if c == 0 else J.chroma_quant_value
            assert blocks == _want_blocks(mid, c, n, quant), (mid, c)


def test_restart_ids_actually_carry_restart_markers():
    """The gate corpus must exercise MCU-counted restarts: id 15 has
    4 MCUs and id%5==0, so DRI + RST0 must be on the wire."""
    payload = J.synth_color_jpeg_bytes(15)
    assert b"\xff\xdd" in payload  # DRI
    sos = payload.index(b"\xff\xda")
    assert b"\xff\xd0" in payload[sos:]  # RST0


@given(
    samp=st.lists(
        st.tuples(st.integers(1, 2), st.integers(1, 2)),
        min_size=2, max_size=3,
    ),
    mcux=st.integers(1, 2),
    mcuy=st.integers(1, 2),
    wpad=st.integers(0, 7),
    hpad=st.integers(0, 7),
    restart=st.integers(0, 4),
    qseed=st.integers(0, 1000),
    base=st.lists(
        st.dictionaries(
            keys=st.integers(min_value=0, max_value=63),
            values=st.integers(min_value=-1023, max_value=1023),
            max_size=10,
        ),
        min_size=1, max_size=12,
    ),
)
@settings(max_examples=80, deadline=None)
def test_arbitrary_color_roundtrip(samp, mcux, mcuy, wpad, hpad,
                                   restart, qseed, base):
    """encode -> decode must be the identity on dequantized
    coefficients for ANY component layout: arbitrary per-component
    (H, V) in 1..2, arbitrary MCU grid, non-aligned dims, arbitrary
    block contents, any restart interval, any (nonzero) quant
    tables."""
    assume(sum(h * v for h, v in samp) <= 10)  # T.81 B.2.3 MCU cap
    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)
    width = 8 * hmax * mcux - (wpad % (8 * hmax))
    height = 8 * vmax * mcuy - (hpad % (8 * vmax))

    def q0(p: int) -> int:
        return (qseed + p) % 17 + 1

    def q1(p: int) -> int:
        return (qseed * 2 + p) % 13 + 2

    comp_blocks = []
    for c, (h, v) in enumerate(samp):
        n = mcux * h * mcuy * v
        tiled = (base * ((n // len(base)) + 2))[c : c + n]
        comp_blocks.append(tiled)
    payload = J.encode_color_jpeg(
        width, height, samp, comp_blocks,
        restart_interval=restart, quants=(q0, q1),
    )
    dec = J.decode_jpeg_components(payload)
    assert dec is not None
    w, h2, comps = dec
    assert (w, h2) == (width, height)
    assert [c[1:3] for c in comps] == samp
    for c, (_, _, _, got) in enumerate(comps):
        quant = q0 if c == 0 else q1
        want = [
            {p: v * quant(p) for p, v in blk.items() if v != 0 or p == 0}
            for blk in comp_blocks[c]
        ]
        for blk in want:
            blk.setdefault(0, 0)
        assert got == want, c


def test_grayscale_wrapper_rejects_color_and_components_accepts_gray():
    color = J.synth_color_jpeg_bytes(7)
    assert J.decode_jpeg_coefficients(color) is None
    assert J.decode_jpeg_components(color) is not None
    gray = J.synth_jpeg_bytes(7)
    dec1 = J.decode_jpeg_coefficients(gray)
    dec3 = J.decode_jpeg_components(gray)
    assert dec1 is not None and dec3 is not None
    assert len(dec3[2]) == 1
    assert dec3[2][0][3] == dec1[2]  # same blocks either way


def test_rejects_corrupt_and_out_of_scope_color():
    good = J.synth_color_jpeg_bytes(15)  # restart variant
    assert J.decode_jpeg_components(b"") is None
    assert J.decode_jpeg_components(good[:-2]) is None  # no EOI
    assert J.decode_jpeg_components(good[: len(good) // 2]) is None
    # progressive frame marker (SOF2): out of scope, not a guess
    prog = bytearray(good)
    sof = prog.index(b"\xff\xc0")
    prog[sof + 1] = 0xC2
    assert J.decode_jpeg_components(bytes(prog)) is None
    # 4-component SOF: out of scope (and length-inconsistent)
    four = bytearray(good)
    four[sof + 9] = 4
    assert J.decode_jpeg_components(bytes(four)) is None
    # duplicate component ids
    dup = bytearray(good)
    dup[sof + 13] = dup[sof + 10]  # second comp id := first comp id
    assert J.decode_jpeg_components(bytes(dup)) is None
    # scan order must follow frame order: swap the two chroma entries
    sosp = bytes(good).index(b"\xff\xda")
    swapped = bytearray(good)
    swapped[sosp + 7], swapped[sosp + 9] = good[sosp + 9], good[sosp + 7]
    assert J.decode_jpeg_components(bytes(swapped)) is None
    # bit flips in the entropy segment: None or a valid different
    # decode, never a crash
    for off in range(sosp + 15, min(sosp + 45, len(good) - 2)):
        bad = bytearray(good)
        bad[off] ^= 0x55
        dec = J.decode_jpeg_components(bytes(bad))
        assert dec is None or isinstance(dec, tuple)


def test_color_pixels_match_literal_formulas():
    """decode_jpeg_pixels (color) == literal four-loop IDCT per
    component + literal per-pixel replication upsample + literal JFIF
    YCbCr->RGB, for one image of each subsampling variant."""
    for mid in (6, 7, 11, 15):  # 4:4:4, 4:2:2, 4:2:0, restart 4:4:4... id%3
        got = J.decode_jpeg_pixels(J.synth_color_jpeg_bytes(mid))
        assert got is not None, mid
        width, height, comps = J.decode_jpeg_components(
            J.synth_color_jpeg_bytes(mid)
        )
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        mcux = -(-width // (8 * hmax))
        mcuy = -(-height // (8 * vmax))
        planes = []
        for _, h, v, blocks in comps:
            cols, rows = mcux * h, mcuy * v
            plane = np.zeros((rows * 8, cols * 8))
            for k, coeffs in enumerate(blocks):
                nat = np.zeros((8, 8))
                for zz, val in coeffs.items():
                    nat[divmod(J.ZIGZAG[zz], 8)] = val
                yb, xb = divmod(k, cols)
                for y in range(8):
                    for x in range(8):
                        s = 0.0
                        for u in range(8):
                            for vv in range(8):
                                cu = 1 / math.sqrt(2) if u == 0 else 1.0
                                cv = 1 / math.sqrt(2) if vv == 0 else 1.0
                                s += (
                                    cu * cv * nat[u, vv]
                                    * math.cos((2 * y + 1) * u * math.pi / 16)
                                    * math.cos((2 * x + 1) * vv * math.pi / 16)
                                )
                        plane[yb * 8 + y, xb * 8 + x] = min(
                            max(round(s / 4 + 128), 0), 255
                        )
            # literal replication upsample: pixel (y, x) of the
            # full-res plane reads component sample (y*v//vmax, x*h//hmax)
            cw = (width * h + hmax - 1) // hmax
            ch = (height * v + vmax - 1) // vmax
            up = np.zeros((height, width))
            for y in range(height):
                for x in range(width):
                    up[y, x] = plane[min(y * v // vmax, ch - 1),
                                     min(x * h // hmax, cw - 1)]
            planes.append(up)
        yy, cb, cr = planes
        ref = np.zeros((height, width, 3), dtype=np.uint8)
        for y in range(height):
            for x in range(width):
                r = yy[y, x] + 1.402 * (cr[y, x] - 128)
                g = (yy[y, x] - 0.344136 * (cb[y, x] - 128)
                     - 0.714136 * (cr[y, x] - 128))
                bch = yy[y, x] + 1.772 * (cb[y, x] - 128)
                ref[y, x] = [
                    min(max(round(ch_), 0), 255) for ch_ in (r, g, bch)
                ]
        assert got.shape == (height, width, 3), mid
        assert (got == ref).all(), mid


def test_decode_pixels_routes_color_jpeg():
    from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.functions import (
        multimodal,
    )

    px = multimodal.decode_pixels(J.synth_color_jpeg_bytes(8), "image/jpeg")
    assert px is not None and px.ndim == 3 and px.shape[2] == 3
    # progressive: unsupported JPEG variants return None like corrupt
    prog = bytearray(J.synth_color_jpeg_bytes(8))
    sof = prog.index(b"\xff\xc0")
    prog[sof + 1] = 0xC2
    assert multimodal.decode_pixels(bytes(prog), "image/jpeg") is None
    with pytest.raises(NotImplementedError):
        multimodal.decode_pixels(b"ID3\x03mp3ish", "audio/mpeg")
