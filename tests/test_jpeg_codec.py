"""Baseline-JPEG codec unit + property tests (functions/jpeg.py).

The encoder exists to synthesize gate fixtures; the decoder is the
product. No JPEG library ships in this container, so compliance is
pinned three ways: a literal re-derivation of the T.81 IDCT formula,
exact integer coefficient round-trips over arbitrary Hypothesis-drawn
blocks (positions, magnitudes, restart intervals, quant tables), and
structural rejection tests for corrupt / out-of-scope input.
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.functions import jpeg as J


def _dequant(blocks, quant=J.quant_table_value):
    return [
        {p: v * quant(p) for p, v in c.items() if v or p == 0}
        for c in blocks
    ]


def test_formula_roundtrip_exact_including_restart_ids():
    for mid in list(range(60)) + [123, 1234, 99999, 10**6, 10**7 + 3]:
        payload = J.synth_jpeg_bytes(mid)
        dec = J.decode_jpeg_coefficients(payload)
        assert dec is not None, mid
        w, h, blocks = dec
        bx, by = J.image_geometry(mid)
        assert (w, h) == (8 * bx, 8 * by)
        assert len(blocks) == bx * by
        want = _dequant(
            [J.block_coefficients(mid, k) for k in range(bx * by)]
        )
        assert blocks == want, mid


@given(
    bx=st.integers(min_value=1, max_value=4),
    by=st.integers(min_value=1, max_value=4),
    restart=st.integers(min_value=0, max_value=5),
    qseed=st.integers(min_value=0, max_value=1000),
    precision=st.sampled_from([8, 12]),
    blocks=st.lists(
        st.dictionaries(
            keys=st.integers(min_value=0, max_value=63),
            values=st.integers(min_value=-1023, max_value=1023),
            max_size=12,
        ),
        min_size=1,
        max_size=16,
    ),
)
@settings(max_examples=80, deadline=None)
def test_arbitrary_coefficient_roundtrip(bx, by, restart, qseed,
                                          precision, blocks):
    """encode -> decode must be the identity on dequantized
    coefficients for ANY block contents: any zigzag positions (long
    zero runs exercise ZRL), any magnitudes up to 10 bits, any restart
    interval, any (nonzero) quant table — at BOTH precisions (SOF0
    8-bit / SOF1 12-bit with Pq=1 tables, r11)."""
    n = bx * by
    blocks = (blocks * ((n // len(blocks)) + 1))[:n]

    def quant(p: int) -> int:
        return (qseed + p) % 17 + 1

    payload = J.encode_baseline_jpeg(
        8 * bx, 8 * by, blocks, restart_interval=restart, quant=quant,
        precision=precision,
    )
    dec = J.decode_jpeg_coefficients(payload)
    assert dec is not None
    w, h, got = dec
    assert (w, h) == (8 * bx, 8 * by)
    want = [
        {
            p: v * quant(p)
            for p, v in c.items()
            if v != 0 or p == 0
        }
        for c in blocks
    ]
    # decoder always reports DC (possibly 0); encoder drops zero ACs
    for c in want:
        c.setdefault(0, 0)
    assert got == want


def test_idct_pixels_match_literal_t81_formula():
    # 8-bit ids only (mid % 7 != 3): the uint8 pixel path is 8-bit by
    # design; 12-bit SOF1 ids coefficient-decode but yield no pixels
    for mid in (0, 7, 5, 23, 445):
        px = J.decode_jpeg_pixels(J.synth_jpeg_bytes(mid))
        w, h, blocks = J.decode_jpeg_coefficients(J.synth_jpeg_bytes(mid))
        bx = (w + 7) // 8
        ref = np.zeros((h, w))
        for k, coeffs in enumerate(blocks):
            nat = np.zeros((8, 8))
            for zz, v in coeffs.items():
                nat[divmod(J.ZIGZAG[zz], 8)] = v
            yb, xb = divmod(k, bx)
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
                    ref[yb * 8 + y, xb * 8 + x] = min(
                        max(round(s / 4 + 128), 0), 255
                    )
        assert px is not None and (px == ref.astype(np.uint8)).all(), mid


def test_rejects_corrupt_and_out_of_scope():
    good = J.synth_jpeg_bytes(5)
    assert J.decode_jpeg_coefficients(b"") is None
    assert J.decode_jpeg_coefficients(b"\xff\xd8\xff\xd9") is None
    assert J.decode_jpeg_coefficients(good[:-2]) is None  # no EOI
    assert J.decode_jpeg_coefficients(good[: len(good) // 2]) is None
    # progressive frame marker (SOF2) is out of scope, not a guess
    prog = bytearray(good)
    sof = prog.index(b"\xff\xc0")
    prog[sof + 1] = 0xC2
    assert J.decode_jpeg_coefficients(bytes(prog)) is None
    # multi-component SOF: out of scope
    multi = bytearray(good)
    multi[sof + 9] = 3
    assert J.decode_jpeg_coefficients(bytes(multi)) is None
    # Pq=1 on an 8-bit file's 65-byte DQT payload: the 16-bit table
    # grammar (r11: now in scope for 12-bit SOF1) expects 128 value
    # bytes, so the truncated segment is structural corruption
    dqt = bytearray(good)
    i = dqt.index(b"\xff\xdb")
    dqt[i + 4] = 0x10
    assert J.decode_jpeg_coefficients(bytes(dqt)) is None
    # bit flips in the entropy segment: None or unchanged, never wrong
    w, h, want = J.decode_jpeg_coefficients(good)
    sos = good.index(b"\xff\xda")
    for off in range(sos + 12, min(sos + 40, len(good) - 2)):
        bad = bytearray(good)
        bad[off] ^= 0x55
        dec = J.decode_jpeg_coefficients(bytes(bad))
        assert dec is None or isinstance(dec, tuple)


def test_rejects_oversized_ac_magnitude_category():
    # T.81 F.1.2.2.1 caps AC SSSS at 10 for 8-bit frames (14 for
    # 12-bit). encode_baseline_jpeg will happily emit a non-conformant
    # stream for a quantized coefficient needing SSSS=11 — the decoder
    # must reject it, mirroring the DC bound (r11 advice).
    over_8 = J.encode_baseline_jpeg(8, 8, [{0: 1, 1: 1500}])  # SSSS 11
    assert J.decode_jpeg_coefficients(over_8) is None
    ok_8 = J.encode_baseline_jpeg(8, 8, [{0: 1, 1: 1000}])  # SSSS 10
    assert J.decode_jpeg_coefficients(ok_8) is not None
    over_12 = J.encode_baseline_jpeg(
        8, 8, [{0: 1, 1: 20000}], precision=12
    )  # SSSS 15
    assert J.decode_jpeg_coefficients(over_12) is None
    ok_12 = J.encode_baseline_jpeg(
        8, 8, [{0: 1, 1: 10000}], precision=12
    )  # SSSS 14
    assert J.decode_jpeg_coefficients(ok_12) is not None


def test_decoder_skips_appn_and_com_segments():
    good = J.synth_jpeg_bytes(9)
    want = J.decode_jpeg_coefficients(good)
    # splice APP0(JFIF-ish) + COM right after SOI
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    com = b"\xff\xfe" + struct.pack(">H", 9) + b"comment"
    spliced = good[:2] + app0 + com + good[2:]
    assert J.decode_jpeg_coefficients(spliced) == want


def test_decode_pixels_routes_jpeg():
    from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.functions import multimodal

    good = J.synth_jpeg_bytes(4)
    px = multimodal.decode_pixels(good, "image/jpeg")
    assert px is not None and px.ndim == 2
    # corrupt JPEG -> None (uniform contract), other containers raise
    assert multimodal.decode_pixels(b"\xff\xd8\xff\xd9", "image/jpeg") is None
    # 12-bit SOF1 (id % 7 == 3): coefficients decode in-engine, the
    # uint8 pixel layer declares it out of scope -> None
    twelve = J.synth_jpeg_bytes(3)
    assert J.decode_jpeg_coefficients(twelve) is not None
    assert multimodal.decode_pixels(twelve, "image/jpeg") is None
    with pytest.raises(NotImplementedError):
        multimodal.decode_pixels(b"ID3\x03mp3ish", "audio/mpeg")


def test_oversubscribed_dht_fails_loud():
    """A corrupt DHT whose BITS declare more codes than a prefix code
    admits (e.g. three 1-bit codes) must raise _Undecodable during
    table construction — not silently append past the flat table and
    decode garbage (r13 ADVICE)."""
    bits = bytes([3] + [0] * 15)  # three codes of length 1: impossible
    with pytest.raises(J._Undecodable):
        J._dht_table(bits, bytes([0, 1, 2]))
    # two 1-bit codes saturate the space: legal, must construct
    table, max_len = J._dht_table(bytes([2] + [0] * 15), bytes([0, 1]))
    assert max_len == 1 and len(table) == 2
    # end-to-end: splice the bad DHT into a valid stream -> None, not
    # garbage (the decoder's uniform corrupt-input contract)
    good = J.synth_jpeg_bytes(9)
    sos = good.find(b"\xff\xda")
    bad_dht = (
        b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + 3) + b"\x00"
        + bits + bytes([0, 1, 2])
    )
    spliced = good[:sos] + bad_dht + good[sos:]
    assert J.decode_jpeg_coefficients(spliced) is None
