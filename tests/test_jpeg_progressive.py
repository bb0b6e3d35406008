"""Progressive (SOF2) JPEG codec tests (functions/jpeg.py, r11).

Same doctrine as test_jpeg_codec.py / test_jpeg_color.py: the encoder
exists to synthesize gate fixtures; the multi-scan decoder is the
product. Compliance is pinned by exact integer coefficient round-trips
over Hypothesis-drawn sampling layouts / dims / blocks / restart
intervals, a cross-check against the BASELINE decoder on identical
coefficient grids (two independent entropy codings of the same data
must dequantize identically), scan-script-discipline rejection tests,
and the stuffed-FF-padding marker-seek regression the progressive work
surfaced (a 1-padding byte of all ones is a legal 0xFF and arrives
stuffed as FF 00 before RSTn/EOI — T.81 B.1.1.5).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.functions import jpeg as J


def _true_want(mid: int, c: int, quant):
    """Expected dequantized true-grid blocks of the progressive synth."""
    hy, vy = J.color_sampling(mid)
    width, height, _, _ = J.color_geometry(mid)
    h, v = (hy, vy) if c == 0 else (1, 1)
    tw, th = J.progressive_true_grid(width, height, h, v, hy, vy)
    return tw, th, [
        {p: val * quant(p) for p, val in J.block_coefficients(mid * 3 + c, k).items()}
        for k in range(tw * th)
    ]


def test_progressive_formula_roundtrip_exact_including_restart_ids():
    """Every subsampling variant (id%3), every MCU grid, padded dims
    and the restart ids round-trip through all nine scans to the exact
    dequantized formula coefficients; MCU padding blocks (touched only
    by the interleaved DC scan, as zero) stay {0: 0}."""
    for mid in list(range(80)) + [123, 1234, 99999, 10**6, 10**7 + 3]:
        payload = J.synth_progressive_jpeg_bytes(mid)
        dec = J.decode_jpeg_progressive(payload)
        assert dec is not None, mid
        w, h, comps = dec
        hy, vy = J.color_sampling(mid)
        width, height, mcux, mcuy = J.color_geometry(mid)
        assert (w, h) == (width, height), mid
        assert [c[1:3] for c in comps] == [(hy, vy), (1, 1), (1, 1)], mid
        for c, (_, ch_, cv_, blocks) in enumerate(comps):
            quant = J.quant_table_value if c == 0 else J.chroma_quant_value
            tw, th, want = _true_want(mid, c, quant)
            gx = mcux * ch_
            for y in range(mcuy * cv_):
                for x in range(gx):
                    got = blocks[y * gx + x]
                    if x < tw and y < th:
                        assert got == want[y * tw + x], (mid, c, x, y)
                    else:
                        assert got == {0: 0}, (mid, c, x, y)


def test_progressive_matches_baseline_on_identical_blocks():
    """Two independent entropy codings of the SAME coefficient grids —
    single-scan baseline vs 9-scan progressive — must dequantize
    identically (padding blocks pinned to {0: 0} in both)."""
    for mid in [0, 2, 5, 15, 35, 41, 77, 1234]:
        hy, vy = J.color_sampling(mid)
        width, height, mcux, mcuy = J.color_geometry(mid)
        sampling = [(hy, vy), (1, 1), (1, 1)]
        comp_blocks = []
        for c, (h, v) in enumerate(sampling):
            tw, th = J.progressive_true_grid(width, height, h, v, hy, vy)
            gx, gy = mcux * h, mcuy * v
            comp_blocks.append([
                J.block_coefficients(mid * 3 + c, y * tw + x)
                if x < tw and y < th else {0: 0}
                for y in range(gy) for x in range(gx)
            ])
        base = J.encode_color_jpeg(width, height, sampling, comp_blocks)
        prog = J.encode_progressive_jpeg(width, height, sampling, comp_blocks)
        assert J.decode_jpeg_components(base) == J.decode_jpeg_progressive(prog), mid


def test_restart_ids_carry_restarts_in_every_scan():
    """A restart id's progressive stream has DRI and per-scan RST
    numbering that restarts at D0 in each scan (9 scans, every one
    with >2 data units carries markers)."""
    payload = J.synth_progressive_jpeg_bytes(15)
    assert b"\xff\xdd" in payload  # DRI
    # RST0 must appear more than once: numbering restarts per scan
    assert payload.count(b"\xff\xd0") >= 2


@settings(max_examples=40, deadline=None)
@given(
    samp=st.sampled_from([(1, 1), (2, 1), (1, 2), (2, 2)]),
    mcux=st.integers(1, 3),
    mcuy=st.integers(1, 3),
    wpad=st.integers(0, 15),
    hpad=st.integers(0, 15),
    restart=st.sampled_from([0, 1, 2, 5]),
    data=st.data(),
)
def test_arbitrary_progressive_roundtrip(samp, mcux, mcuy, wpad, hpad, restart, data):
    """Exact round-trip over arbitrary sampling / dims / coefficient
    grids / restart intervals — including dense blocks (correction-bit
    storms in the refinement scans), long zero runs (ZRL in first and
    refinement scans) and DC-only blocks (EOB-run folding)."""
    hy, vy = samp
    width = max(1, 8 * hy * mcux - (wpad % (8 * hy)))
    height = max(1, 8 * vy * mcuy - (hpad % (8 * vy)))
    sampling = [(hy, vy), (1, 1), (1, 1)]
    comp_blocks = []
    for c, (h, v) in enumerate(sampling):
        tw, th = J.progressive_true_grid(width, height, h, v, hy, vy)
        gx, gy = mcux * h, mcuy * v
        grid = []
        for y in range(gy):
            for x in range(gx):
                if x < tw and y < th:
                    blk = {0: data.draw(st.integers(-1000, 1000))}
                    n_ac = data.draw(st.integers(0, 10))
                    for p in data.draw(
                        st.lists(st.integers(1, 63), min_size=n_ac,
                                 max_size=n_ac, unique=True)
                    ):
                        v_ = data.draw(st.integers(-1000, 1000))
                        blk[p] = v_ if v_ else 7
                    grid.append(blk)
                else:
                    grid.append({0: 0})
        comp_blocks.append(grid)
    payload = J.encode_progressive_jpeg(
        width, height, sampling, comp_blocks, restart_interval=restart
    )
    dec = J.decode_jpeg_progressive(payload)
    assert dec is not None
    w, h, comps = dec
    assert (w, h) == (width, height)
    quants = (J.quant_table_value, J.chroma_quant_value)
    for c, (_, _, _, blocks) in enumerate(comps):
        quant = quants[0] if c == 0 else quants[1]
        want = [
            {0: blk.get(0, 0) * quant(0),
             **{p: v_ * quant(p) for p, v_ in blk.items() if p and v_}}
            for blk in comp_blocks[c]
        ]
        assert blocks == want, c


def test_grayscale_progressive_script_roundtrip():
    """The single-component script (5 scans, no interleave anywhere)
    round-trips exactly."""
    blocks = [J.block_coefficients(17, k) for k in range(6)]
    payload = J.encode_progressive_jpeg(48, 8, [(1, 1)], [blocks])
    dec = J.decode_jpeg_progressive(payload)
    assert dec is not None
    _, _, comps = dec
    assert len(comps) == 1
    want = [
        {p: v * J.quant_table_value(p) for p, v in blk.items()}
        for blk in blocks
    ]
    assert comps[0][3] == want


def test_subset_interleaved_dc_scan_roundtrip():
    """A DC scan interleaving only TWO of three frame components
    (Ns=2 — legal per T.81 B.2.3; MCU geometry stays frame-wide) plus
    a separate non-interleaved DC scan for the third, then per-band AC
    scans, round-trips exactly. The synth's 9-scan script never emits
    this shape, so it pins the decoder's scan-subset handling
    independently."""
    mid = 35
    hy, vy = J.color_sampling(mid)
    width, height, mcux, mcuy = J.color_geometry(mid)
    sampling = [(hy, vy), (1, 1), (1, 1)]
    comp_blocks = []
    for c, (h, v) in enumerate(sampling):
        tw, th = J.progressive_true_grid(width, height, h, v, hy, vy)
        gx, gy = mcux * h, mcuy * v
        comp_blocks.append([
            J.block_coefficients(mid * 3 + c, y * tw + x)
            if x < tw and y < th else {0: 0}
            for y in range(gy) for x in range(gx)
        ])
    scans = [
        ([0, 1], 0, 0, 0, 1),  # DC first, comps 0+1 interleaved
        ([2], 0, 0, 0, 0),     # DC first, comp 2 alone, full precision
        ([0], 1, 63, 0, 0),
        ([1], 1, 63, 0, 0),
        ([2], 1, 63, 0, 0),
        ([0, 1], 0, 0, 1, 0),  # DC refine for the Al=1 pair
    ]
    payload = J.encode_progressive_jpeg(
        width, height, sampling, comp_blocks, scans=scans
    )
    dec = J.decode_jpeg_progressive(payload)
    assert dec is not None
    base = J.encode_color_jpeg(width, height, sampling, comp_blocks)
    assert dec == J.decode_jpeg_components(base)


def test_progression_discipline_rejections():
    """Scan-script violations return None: refinement without a first
    scan, AC before DC, truncated progressions (EOI before all
    refinements land), double-first of the same band."""
    good = J.synth_progressive_jpeg_bytes(7)
    assert J.decode_jpeg_progressive(good) is not None
    # truncation: cut after the Nth SOS and append EOI — a spec-legal
    # partial progression the gate decoder refuses (incomplete Al
    # state), for every prefix of the 9-scan script
    sos_positions = []
    i = 2
    while True:
        i = good.find(b"\xff\xda", i)
        if i < 0:
            break
        sos_positions.append(i)
        i += 2
    assert len(sos_positions) == 9
    for n_keep in range(1, 9):
        cut = good[: sos_positions[n_keep]] + b"\xff\xd9"
        assert J.decode_jpeg_progressive(cut) is None, n_keep
    # baseline frame -> not this decoder; progressive frame -> not baseline
    assert J.decode_jpeg_progressive(J.synth_color_jpeg_bytes(7)) is None
    assert J.decode_jpeg_components(good) is None
    # corrupt structure
    assert J.decode_jpeg_progressive(b"") is None
    assert J.decode_jpeg_progressive(b"\xff\xd8\xff\xd9") is None
    assert J.decode_jpeg_progressive(good[:-2]) is None  # no EOI
    assert J.decode_jpeg_progressive(good[: len(good) // 2]) is None
    # entropy bit flips: None or a decodable tuple, never an exception
    sos = good.index(b"\xff\xda")
    for off in range(sos + 12, min(sos + 48, len(good) - 2)):
        bad = bytearray(good)
        bad[off] ^= 0x55
        dec = J.decode_jpeg_progressive(bytes(bad))
        assert dec is None or isinstance(dec, tuple)


def test_duplicate_first_scan_rejected():
    """Sending the same spectral band twice with Ah=0 violates the
    per-coefficient progression and must return None."""
    good = J.synth_progressive_jpeg_bytes(3)
    # locate scan 2 (first AC scan of comp 0) and splice a copy of it
    # right after itself: its band is then 'first-sent' twice
    first = good.find(b"\xff\xda")
    second = good.find(b"\xff\xda", first + 2)
    third = good.find(b"\xff\xda", second + 2)
    assert third > second > first > 0
    # the copied segment includes scan 2's DHT (which precedes the SOS)
    dht_before_second = good.rfind(b"\xff\xc4", first, second)
    scan2 = good[dht_before_second:third]
    spliced = good[:third] + scan2 + good[third:]
    assert J.decode_jpeg_progressive(spliced) is None


def test_peek_frame_header_agrees_with_decoders():
    """The one-walk dispatch (_peek_frame_header) must never disagree
    with the full decoders: every synth payload peeks to its true
    (SOFn, component count), and anything the peek rejects the full
    decoders reject too."""
    for mid in range(40):
        want_gray = (0xC1, 12, 1) if mid % 7 == 3 else (0xC0, 8, 1)
        assert J._peek_frame_header(J.synth_jpeg_bytes(mid)) == want_gray
        assert J._peek_frame_header(
            J.synth_color_jpeg_bytes(mid)
        ) == (0xC0, 8, 3)
        assert J._peek_frame_header(
            J.synth_progressive_jpeg_bytes(mid)
        ) == (0xC2, 8, 3)
    for junk in (b"", b"\xff\xd8", b"\xff\xd8\xff\xd9", b"\x00" * 40):
        assert J._peek_frame_header(junk) is None
        assert J.decode_jpeg_components(junk) is None
        assert J.decode_jpeg_progressive(junk) is None


def test_forged_dimensions_rejected_without_allocation():
    """Review finding (r11): a tiny payload whose SOF claims
    65535x65535 must be rejected by the payload-size bound (>= 1 bit
    of entropy data per data unit) BEFORE any O(width*height)
    allocation — in microseconds, not after gigabytes. Pins both
    decoders."""
    import time

    gray = bytearray(J.synth_jpeg_bytes(5))
    sof = gray.index(b"\xff\xc0")
    gray[sof + 5 : sof + 9] = struct.pack(">HH", 60000, 60000)
    t0 = time.perf_counter()
    assert J.decode_jpeg_components(bytes(gray)) is None
    assert J.decode_jpeg_coefficients(bytes(gray)) is None
    color = bytearray(J.synth_color_jpeg_bytes(7))
    sofc = color.index(b"\xff\xc0")
    color[sofc + 5 : sofc + 9] = struct.pack(">HH", 65535, 65535)
    assert J.decode_jpeg_components(bytes(color)) is None
    prog = bytearray(J.synth_progressive_jpeg_bytes(7))
    sof2 = prog.index(b"\xff\xc2")
    prog[sof2 + 5 : sof2 + 9] = struct.pack(">HH", 65535, 65535)
    assert J.decode_jpeg_progressive(bytes(prog)) is None
    assert J.decode_jpeg_pixels(bytes(prog)) is None
    # the whole battery must run in well under a second — a
    # preallocating decoder takes tens of seconds and gigabytes here
    assert time.perf_counter() - t0 < 1.0


def test_stuffed_ff_padding_before_markers_decodes():
    """Regression (r11): a 1-padding byte of all ones is a legal 0xFF
    written as FF 00 — the marker seek before RSTn/EOI must skip it.
    These exact coefficient sets produce such padding bytes on the
    wire; before the fix the decoder misread both valid streams as
    corrupt."""
    eoi_blocks = [
        {0: -416, 60: -107, 10: 46, 16: -354, 63: -612, 18: 583},
        {0: -236, 62: 292, 28: -181, 57: 870, 2: 793, 52: 926, 49: 134},
        {0: 124, 47: -835},
        {0: -899, 27: 319, 29: 780, 40: -414, 49: -6, 9: -900},
        {0: 867, 9: -297, 11: -423, 31: -391, 27: -477},
        {0: 513, 63: -384, 42: -11, 17: 141, 26: 369, 16: -193},
    ]
    pay = J.encode_baseline_jpeg(48, 8, eoi_blocks)
    assert pay.endswith(b"\xff\x00\xff\xd9")  # the padding byte IS 0xFF
    assert J.decode_jpeg_coefficients(pay) is not None
    rst_blocks = [
        {0: -291, 9: -344, 33: 334, 31: 249},
        {0: -559, 54: -496, 57: -697, 25: 353, 27: 62, 63: 207, 38: 805},
        {0: 177, 20: -846},
        {0: -450},
        {0: 888, 2: 722, 25: 121},
    ]
    pay = J.encode_baseline_jpeg(40, 8, rst_blocks, restart_interval=2)
    assert b"\xff\x00\xff\xd0" in pay  # stuffed padding before RST0
    dec = J.decode_jpeg_coefficients(pay)
    assert dec is not None
    want = [
        {p: v * J.quant_table_value(p) for p, v in blk.items()}
        for blk in rst_blocks
    ]
    assert dec[2] == want


def test_progressive_pixels_match_baseline_pixels():
    """decode_jpeg_pixels accepts progressive streams and — because
    the coefficient layer reassembles identically — produces the SAME
    RGB array as the baseline encoding of the same blocks."""
    for mid in [0, 1, 2, 15, 35]:
        hy, vy = J.color_sampling(mid)
        width, height, mcux, mcuy = J.color_geometry(mid)
        sampling = [(hy, vy), (1, 1), (1, 1)]
        comp_blocks = []
        for c, (h, v) in enumerate(sampling):
            tw, th = J.progressive_true_grid(width, height, h, v, hy, vy)
            gx, gy = mcux * h, mcuy * v
            comp_blocks.append([
                J.block_coefficients(mid * 3 + c, y * tw + x)
                if x < tw and y < th else {0: 0}
                for y in range(gy) for x in range(gx)
            ])
        base_px = J.decode_jpeg_pixels(
            J.encode_color_jpeg(width, height, sampling, comp_blocks)
        )
        prog_px = J.decode_jpeg_pixels(
            J.encode_progressive_jpeg(width, height, sampling, comp_blocks)
        )
        assert base_px is not None and prog_px is not None
        assert base_px.shape == prog_px.shape == (height, width, 3)
        assert np.array_equal(base_px, prog_px), mid


def test_decode_pixels_routes_progressive_jpeg():
    from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.functions import multimodal

    px = multimodal.decode_pixels(J.synth_progressive_jpeg_bytes(4), "image/jpeg")
    assert px is not None and px.ndim == 3
