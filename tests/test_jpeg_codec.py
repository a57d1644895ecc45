"""Baseline JPEG codec (functions/jpeg_codec.py): bit-exact entropy
round trips, pixel differentials against a direct IDCT reference, and
honest rejections. No Spark needed — these are pure-kernel tests."""

import struct

import numpy as np
import pytest

from osm_admin_boundary_conflation_spark.functions import jpeg_codec as J


def _quant(dc=16, ac=4):
    q = np.full((8, 8), ac, dtype=np.int64)
    q[0, 0] = dc
    return q


def _ref_pixels(coeffs, quant):
    """Independent reference: dequant -> orthonormal IDCT -> +128 ->
    clamp, assembled to an image. Shares only the DCT basis definition
    with the decoder, none of the entropy machinery."""
    by, bx = coeffs.shape[:2]
    deq = (coeffs * quant).astype(np.float64)
    px = np.einsum("ux,vy,abuv->abxy", J._A, J._A, deq)
    px = np.clip(np.rint(px + 128.0), 0, 255).astype(np.uint8)
    return px.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)


def _random_coeffs(rng, shape):
    coeffs = np.zeros(shape + (8, 8), dtype=np.int64)
    flat_blocks = coeffs.reshape(-1, 64)
    for blk in flat_blocks:
        nz = rng.randint(0, 12)
        idx = rng.choice(64, size=nz, replace=False)
        blk[idx] = rng.randint(-255, 255, size=nz)
        blk[0] = rng.randint(-700, 700)  # big DC diffs -> long codes
    return coeffs


def test_coefficient_round_trip_is_bit_exact():
    """Encoder plants arbitrary quantized coefficients (random sparsity,
    negative values, big DC swings); the decoder must recover every
    integer exactly BEFORE any float enters — this pins the whole
    entropy layer: canonical Huffman, DC categories + sign extension,
    AC run/size, EOB, ZRL, byte stuffing."""
    rng = np.random.RandomState(1234)
    for _ in range(8):
        shape = (rng.randint(1, 5), rng.randint(1, 5))
        coeffs = _random_coeffs(rng, shape)
        blob = J.encode_baseline_jpeg(coeffs, _quant(), shape[1] * 8, shape[0] * 8)
        got, qtabs = J.decode_baseline_jpeg(blob, return_coeffs=True)
        assert np.array_equal(got[0], coeffs)
        assert np.array_equal(qtabs[0], _quant())


def test_pixels_match_direct_idct_reference():
    rng = np.random.RandomState(77)
    coeffs = _random_coeffs(rng, (3, 4))
    blob = J.encode_baseline_jpeg(coeffs, _quant(), 32, 24)
    img = J.decode_baseline_jpeg(blob)
    assert img.shape == (24, 32) and img.dtype == np.uint8
    assert np.array_equal(img, _ref_pixels(coeffs, _quant()))


def test_zrl_runs_and_eob_edge_cases():
    """>16-zero runs force ZRL symbols; a nonzero at position 63 must
    suppress EOB; an all-zero block is DC-diff-0 + EOB only."""
    coeffs = np.zeros((1, 3, 8, 8), dtype=np.int64)
    coeffs[0, 0, 7, 7] = 5  # zigzag position 63: run of 62 zeros -> 3 ZRLs
    # block 1 all zero; block 2 a lone mid-block value
    coeffs[0, 2, 3, 3] = -9
    blob = J.encode_baseline_jpeg(coeffs, _quant(), 24, 8)
    got, _ = J.decode_baseline_jpeg(blob, return_coeffs=True)
    assert np.array_equal(got[0], coeffs)


def test_restart_markers_reset_dc_predictor():
    rng = np.random.RandomState(5)
    coeffs = _random_coeffs(rng, (2, 4))
    blob = J.encode_baseline_jpeg(coeffs, _quant(), 32, 16, restart_interval=3)
    assert any(bytes([0xFF, 0xD0 + m]) in blob for m in range(8))
    got, _ = J.decode_baseline_jpeg(blob, return_coeffs=True)
    assert np.array_equal(got[0], coeffs)
    # without RST handling the same stream must NOT decode: corrupt one
    # marker id and the decoder should notice the sequence break
    idx = blob.index(b"\xff\xd0", 200)
    bad = blob[:idx] + b"\xff\xd4" + blob[idx + 2 :]
    with pytest.raises(ValueError, match="expected RST"):
        J.decode_baseline_jpeg(bad, return_coeffs=True)


def test_byte_stuffing_survives():
    """DC value chosen so the entropy stream contains literal 0xFF
    bytes (stuffed as FF00); the decoder must unstuff, not treat them
    as markers."""
    rng = np.random.RandomState(11)
    for _ in range(20):
        coeffs = _random_coeffs(rng, (1, 2))
        blob = J.encode_baseline_jpeg(coeffs, _quant(), 16, 8)
        if b"\xff\x00" in blob[20:]:
            break
    else:
        pytest.skip("no stuffed byte produced in 20 seeds (unexpected)")
    got, _ = J.decode_baseline_jpeg(blob, return_coeffs=True)
    assert np.array_equal(got[0], coeffs)


def test_color_444_round_trip_and_ycbcr():
    rng = np.random.RandomState(9)
    coeffs = np.zeros((3, 1, 2, 8, 8), dtype=np.int64)
    for ci in range(3):
        coeffs[ci] = _random_coeffs(rng, (1, 2))
    blob = J.encode_baseline_jpeg(coeffs, _quant(), 16, 8)
    got, _ = J.decode_baseline_jpeg(blob, return_coeffs=True)
    assert np.array_equal(got, coeffs)
    img = J.decode_baseline_jpeg(blob)
    assert img.shape == (8, 16, 3)
    # spot-check the YCbCr->RGB math on the first pixel
    y, cb, cr = (
        float(_ref_pixels(coeffs[c], _quant())[0, 0]) for c in range(3)
    )
    want = np.clip(
        np.rint(
            [
                y + 1.402 * (cr - 128),
                y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128),
                y + 1.772 * (cb - 128),
            ]
        ),
        0,
        255,
    ).astype(np.uint8)
    assert np.array_equal(img[0, 0], want)


def test_dc_only_constant_blocks_decode_losslessly():
    """The gated-query closed form: even block value v, DC quant 16 =>
    quantized DC (v-128)/2 is exact and decode returns exactly v."""
    for v in (0, 2, 128, 200, 254):
        coeffs = np.zeros((1, 1, 8, 8), dtype=np.int64)
        coeffs[0, 0, 0, 0] = (v - 128) // 2
        img = J.decode_baseline_jpeg(J.encode_baseline_jpeg(coeffs, _quant(), 8, 8))
        assert (img == v).all()


def test_non_multiple_of_8_dimensions_crop():
    coeffs = np.zeros((2, 2, 8, 8), dtype=np.int64)
    img = J.decode_baseline_jpeg(J.encode_baseline_jpeg(coeffs, _quant(), 13, 11))
    assert img.shape == (11, 13)


def test_honest_rejections():
    coeffs = np.zeros((1, 1, 8, 8), dtype=np.int64)
    blob = J.encode_baseline_jpeg(coeffs, _quant(), 8, 8)
    with pytest.raises(ValueError, match="missing SOI"):
        J.decode_baseline_jpeg(b"XX" + blob[2:])
    # flip SOF0 -> SOF2: the baseline full-band SOS (Ss=0, Se=63) is
    # ILLEGAL in a progressive frame (G.1.1.1.1 — DC and AC may not
    # share a scan), so the decoder must reject it, not mis-decode
    idx = blob.index(b"\xff\xc0")
    prog = blob[:idx] + b"\xff\xc2" + blob[idx + 2 :]
    with pytest.raises(ValueError, match="mixing DC and AC"):
        J.decode_baseline_jpeg(prog)
    # arithmetic-coded progressive (SOF10) stays an honest rejection
    arith = blob[:idx] + b"\xff\xca" + blob[idx + 2 :]
    with pytest.raises(NotImplementedError, match="arithmetic"):
        J.decode_baseline_jpeg(arith)
    # illegal sampling byte (factor 0): hard ValueError, not a decode
    sof_at = idx + 2 + 2  # past marker + length
    bad = bytearray(blob)
    bad[sof_at + 6 + 1] = 0x01  # component 1 sampling h=0
    with pytest.raises(ValueError, match="illegal sampling"):
        J.decode_baseline_jpeg(bytes(bad))
    with pytest.raises(ValueError, match="truncated|expected marker"):
        J.decode_baseline_jpeg(blob[:20])
    # fractional upsampling ratio (hmax=3 not divisible by h=2): honest
    # NotImplementedError — no real encoder emits this layout
    y3 = np.zeros((1, 3, 8, 8), dtype=np.int64)
    c2 = np.zeros((1, 2, 8, 8), dtype=np.int64)
    c1 = np.zeros((1, 1, 8, 8), dtype=np.int64)
    frac = J.encode_baseline_jpeg(
        [y3, c2, c1], _quant(), 24, 8, sampling=[(3, 1), (2, 1), (1, 1)]
    )
    with pytest.raises(NotImplementedError, match="fractional"):
        J.decode_baseline_jpeg(frac)


def test_decode_media_routes_jpeg():
    from osm_admin_boundary_conflation_spark.operators.multimodal import (
        build_jpeg,
        decode_media,
    )

    assert decode_media(build_jpeg(42)) == (16, 16)
    with pytest.raises(NotImplementedError, match="MP3/H.264"):
        decode_media(b"\x00\x01\x02\x03garbage")


def test_property_roundtrip_random_coeff_matrices():
    """Hypothesis-style property (seeded sweep): ANY int coefficient
    block within JPEG's codable range must entropy-round-trip exactly,
    for 1..3 components and varying restart intervals."""
    rng = np.random.RandomState(20260817)
    for trial in range(25):
        nc = rng.choice([1, 3])
        by, bx = rng.randint(1, 4), rng.randint(1, 4)
        coeffs = np.zeros((nc, by, bx, 8, 8), dtype=np.int64)
        for ci in range(nc):
            coeffs[ci] = _random_coeffs(rng, (by, bx))
        ri = int(rng.choice([0, 1, 2, 5]))
        blob = J.encode_baseline_jpeg(coeffs, _quant(), bx * 8, by * 8, restart_interval=ri)
        got, _ = J.decode_baseline_jpeg(blob, return_coeffs=True)
        assert np.array_equal(got, coeffs), f"trial {trial} nc={nc} ri={ri}"


def test_fuzz_corruption_never_hangs_or_miscrashes():
    """Deterministic byte-corruption fuzz: a flipped byte anywhere in
    the stream must either still decode (corruption may land in
    ignorable padding / produce other valid symbols) or raise a clean
    ValueError/NotImplementedError — never hang, never segfault-style
    explode. Bounds the entropy decoder's failure behavior."""
    rng = np.random.RandomState(99)
    coeffs = _random_coeffs(rng, (2, 2))
    blob = bytearray(J.encode_baseline_jpeg(coeffs, _quant(), 16, 16))
    for i in range(2, len(blob), max(1, len(blob) // 60)):
        bad = bytearray(blob)
        bad[i] ^= 0x5A
        try:
            J.decode_baseline_jpeg(bytes(bad))
        except (ValueError, NotImplementedError, IndexError, struct.error):
            pass



def test_sos_component_order_resolved_by_id():
    """ADVICE r05 #4: an externally produced baseline JPEG may list SOS
    components in a different order than SOF0; MCU interleave follows
    SCAN order (T.81 B.2.3) but storage/tables resolve by component ID.
    A positional decoder would swap planes silently — require the
    reordered-scan file to decode IDENTICALLY to the frame-order one."""
    rng = np.random.RandomState(21)
    coeffs = np.zeros((3, 2, 2, 8, 8), dtype=np.int64)
    for ci in range(3):
        coeffs[ci] = _random_coeffs(rng, (2, 2))
    normal = J.encode_baseline_jpeg(coeffs, _quant(), 16, 16)
    for order in ([2, 1, 0], [1, 2, 0]):
        reordered = J.encode_baseline_jpeg(
            coeffs, _quant(), 16, 16, scan_order=order
        )
        assert reordered != normal  # genuinely a different byte stream
        got, _ = J.decode_baseline_jpeg(reordered, return_coeffs=True)
        assert np.array_equal(got, coeffs)
        assert np.array_equal(
            J.decode_baseline_jpeg(reordered), J.decode_baseline_jpeg(normal)
        )


def test_sos_unknown_or_duplicate_component_id_rejected():
    """Scan entries naming a component SOF0 never declared (or naming
    one twice) must error, not decode with garbage table bindings."""
    coeffs = np.zeros((3, 1, 1, 8, 8), dtype=np.int64)
    coeffs[:, :, :, 0, 0] = 4
    blob = bytearray(J.encode_baseline_jpeg(coeffs, _quant(), 8, 8))
    sos = blob.find(b"\xff\xda")
    assert sos > 0
    # entries live at sos+5 .. sos+5+2*3, as (component_id, tables) pairs
    bad = bytearray(blob)
    bad[sos + 5] = 77  # unknown id
    with pytest.raises(ValueError, match="not among SOF0"):
        J.decode_baseline_jpeg(bytes(bad))
    dup = bytearray(blob)
    dup[sos + 5 + 2] = dup[sos + 5]  # second entry repeats first id
    with pytest.raises(ValueError, match="twice"):
        J.decode_baseline_jpeg(bytes(dup))


def test_encoder_rejects_invalid_scan_order():
    coeffs = np.zeros((3, 1, 1, 8, 8), dtype=np.int64)
    with pytest.raises(ValueError, match="scan_order"):
        J.encode_baseline_jpeg(coeffs, _quant(), 8, 8, scan_order=[0, 0, 1])


# ---------------------------------------------------------------------------
# Chroma subsampling (VERDICT r05 item 4): 4:2:0 / 4:2:2 MCU tiling
# ---------------------------------------------------------------------------


def test_420_coefficient_round_trip_is_bit_exact():
    """4:2:0 interleave: each MCU carries four Y data units then one Cb
    and one Cr (T.81 A.2.3). Random coefficients in every block of all
    three planes must survive encode->decode bit-exactly, including
    across restart markers (per-component DC predictors reset)."""
    rng = np.random.RandomState(420)
    # 40x24 frame -> mcus_x=3, mcus_y=2; Y grid 4x6, chroma 2x3
    y = _random_coeffs(rng, (4, 6))
    cb = _random_coeffs(rng, (2, 3))
    cr = _random_coeffs(rng, (2, 3))
    for rst in (0, 1, 3):
        blob = J.encode_baseline_jpeg(
            [y, cb, cr], _quant(), 40, 24,
            sampling=[(2, 2), (1, 1), (1, 1)], restart_interval=rst,
        )
        got, qtabs = J.decode_baseline_jpeg(blob, return_coeffs=True)
        assert isinstance(got, list)
        assert np.array_equal(got[0], y)
        assert np.array_equal(got[1], cb)
        assert np.array_equal(got[2], cr)


def test_420_pixels_match_444_on_prereplicated_chroma():
    """Differential 4:2:0 vs 4:4:4: if the 4:4:4 encoding carries the
    chroma planes pre-replicated 2x2 (what box upsampling reconstructs),
    both files must decode to the SAME RGB image. This pins the MCU
    tiling, the chroma crop, and the upsample path against the already-
    verified 4:4:4 decoder with no reference to internal state."""
    rng = np.random.RandomState(99)
    q = _quant()
    # DC-only planes so chroma replication in coefficient space is exact:
    # a constant 8x8 block upsampled 2x2 equals four constant blocks.
    def dc_only(shape, lo=-40, hi=40):
        c = np.zeros(shape + (8, 8), dtype=np.int64)
        c[:, :, 0, 0] = rng.randint(lo, hi, size=shape)
        return c

    y = dc_only((4, 4))
    cb = dc_only((2, 2))
    cr = dc_only((2, 2))
    sub = J.encode_baseline_jpeg(
        [y, cb, cr], q, 32, 32, sampling=[(2, 2), (1, 1), (1, 1)]
    )
    # pre-replicate each chroma block 2x2 in the block grid
    cb_full = np.repeat(np.repeat(cb, 2, axis=0), 2, axis=1)
    cr_full = np.repeat(np.repeat(cr, 2, axis=0), 2, axis=1)
    full = J.encode_baseline_jpeg(np.stack([y, cb_full, cr_full]), q, 32, 32)
    assert np.array_equal(J.decode_baseline_jpeg(sub), J.decode_baseline_jpeg(full))


def test_422_and_scan_order_and_odd_dims():
    """4:2:2 (Y 2x1), SOS scan order Cr,Y,Cb, and non-MCU-multiple
    dimensions: coefficients round-trip and the decoded image crops to
    the declared WxH."""
    rng = np.random.RandomState(422)
    # 36x20 -> mcus_x=ceil(36/16)=3, mcus_y=ceil(20/8)=3
    y = _random_coeffs(rng, (3, 6))
    cb = _random_coeffs(rng, (3, 3))
    cr = _random_coeffs(rng, (3, 3))
    blob = J.encode_baseline_jpeg(
        [y, cb, cr], _quant(), 36, 20,
        sampling=[(2, 1), (1, 1), (1, 1)], scan_order=[2, 0, 1],
    )
    got, _ = J.decode_baseline_jpeg(blob, return_coeffs=True)
    assert np.array_equal(got[0], y)
    assert np.array_equal(got[1], cb)
    assert np.array_equal(got[2], cr)
    assert J.decode_baseline_jpeg(blob).shape == (20, 36, 3)


def test_420_dc_only_closed_form_exact():
    """The gate's closed form: even luma v with DC quant 16 and constant
    chroma 138 (DC coeff 5) must decode to exactly (v+14, v-11, v+18)
    per pixel — the integer offsets the media_decode_jpeg420 oracle
    hardcodes (see multimodal.build_jpeg420)."""
    q = np.ones((8, 8), dtype=np.int64)
    q[0, 0] = 16
    v = 120
    y = np.zeros((2, 2, 8, 8), dtype=np.int64)
    y[:, :, 0, 0] = (v - 128) // 2
    cb = np.zeros((1, 1, 8, 8), dtype=np.int64)
    cr = np.zeros((1, 1, 8, 8), dtype=np.int64)
    cb[0, 0, 0, 0] = 5
    cr[0, 0, 0, 0] = 5
    blob = J.encode_baseline_jpeg(
        [y, cb, cr], q, 16, 16, sampling=[(2, 2), (1, 1), (1, 1)]
    )
    img = J.decode_baseline_jpeg(blob)
    assert (img[:, :, 0] == v + 14).all()
    assert (img[:, :, 1] == v - 11).all()
    assert (img[:, :, 2] == v + 18).all()


def test_encoder_rejects_bad_sampling_grids():
    y = np.zeros((2, 2, 8, 8), dtype=np.int64)
    c = np.zeros((1, 1, 8, 8), dtype=np.int64)
    with pytest.raises(ValueError, match="expected block grid"):
        J.encode_baseline_jpeg(
            [y, c, c], _quant(), 32, 32, sampling=[(2, 2), (1, 1), (1, 1)]
        )  # 32x32 needs a 4x4 Y grid, not 2x2
    with pytest.raises(ValueError, match="sampling factors"):
        J.encode_baseline_jpeg(
            [y, c, c], _quant(), 16, 16, sampling=[(5, 1), (1, 1), (1, 1)]
        )


# ---------------------------------------------------------------------------
# Progressive JPEG (SOF2, T.81 Annex G) — round 6
# ---------------------------------------------------------------------------


def test_progressive_coefficient_round_trip_bit_exact():
    """The default libjpeg-style scan script (DC first at Al=1, AC
    bands at Al=2, two AC refinement sweeps, DC refinement) must
    recover arbitrary planted coefficients exactly: pins DC successive
    approximation (arithmetic point transform), AC first scans with
    EOB runs, and AC refinement (newly-significant bits + correction
    bits + zero-history runs)."""
    rng = np.random.RandomState(62)
    for _ in range(6):
        shape = (rng.randint(1, 5), rng.randint(1, 5))
        coeffs = _random_coeffs(rng, shape)
        blob = J.encode_progressive_jpeg(coeffs, _quant(), shape[1] * 8, shape[0] * 8)
        got, qtabs = J.decode_baseline_jpeg(blob, return_coeffs=True)
        assert np.array_equal(got[0], coeffs)
        assert np.array_equal(qtabs[0], _quant())


def test_progressive_pixels_identical_to_baseline():
    """Same quantized coefficients through SOF0 and SOF2 encoders must
    decode to the IDENTICAL image — progressive is an entropy-layer
    reordering, not a different reconstruction."""
    rng = np.random.RandomState(63)
    gray = _random_coeffs(rng, (3, 4))
    color = np.stack([_random_coeffs(rng, (2, 3)) for _ in range(3)])
    for coeffs, w, h in [(gray, 32, 24), (color, 24, 16)]:
        base = J.encode_baseline_jpeg(coeffs, _quant(), w, h)
        prog = J.encode_progressive_jpeg(coeffs, _quant(), w, h)
        assert prog != base
        assert b"\xff\xc2" in prog and b"\xff\xc2" not in base
        assert np.array_equal(
            J.decode_baseline_jpeg(base), J.decode_baseline_jpeg(prog)
        )


def test_progressive_420_subsampled_round_trip():
    """Progressive + 4:2:0 (the layout most web images ship): the DC
    scan interleaves four Y units per MCU while AC scans walk each
    component's OWN non-interleaved grid (T.81 A.2.2) — different
    traversals that must land in the same coefficient arrays."""
    rng = np.random.RandomState(64)
    y = _random_coeffs(rng, (4, 6))
    cb = _random_coeffs(rng, (2, 3))
    cr = _random_coeffs(rng, (2, 3))
    # 40x24 at 4:2:0: the padded MCU grid is 4x6 Y blocks but Y's own
    # non-interleaved grid is ceil(24/8) x ceil(40/8) = 3x5 — AC in the
    # padding row/column is uncodable (T.81 A.2.2) and must be REJECTED,
    # not silently dropped (the baseline interleaved scan does code it).
    with pytest.raises(ValueError, match="MCU padding"):
        J.encode_progressive_jpeg(
            [y, cb, cr], _quant(), 40, 24, sampling=[(2, 2), (1, 1), (1, 1)]
        )
    y[3, :, :, :] = 0
    y[:, 5, :, :] = 0
    y[3, :, 0, 0] = rng.randint(-40, 40, size=6)  # padding DC: codable
    y[:, 5, 0, 0] = rng.randint(-40, 40, size=4)  # (interleaved DC scan)
    blob = J.encode_progressive_jpeg(
        [y, cb, cr], _quant(), 40, 24, sampling=[(2, 2), (1, 1), (1, 1)]
    )
    got, _ = J.decode_baseline_jpeg(blob, return_coeffs=True)
    assert np.array_equal(got[0], y)
    assert np.array_equal(got[1], cb)
    assert np.array_equal(got[2], cr)
    # pixel-differential against the baseline 4:2:0 encoder
    base = J.encode_baseline_jpeg(
        [y, cb, cr], _quant(), 40, 24, sampling=[(2, 2), (1, 1), (1, 1)]
    )
    assert np.array_equal(J.decode_baseline_jpeg(base), J.decode_baseline_jpeg(blob))


def test_progressive_custom_scan_scripts():
    """Scan scripts a conformant decoder must accept beyond the default:
    spectral-only (no successive approximation), three-way band splits,
    and deep Al=3 approximation with three refinement sweeps."""
    rng = np.random.RandomState(65)
    coeffs = _random_coeffs(rng, (2, 2))
    scripts = [
        # spectral selection only, Ah=Al=0
        [((0,), 0, 0, 0, 0), ((0,), 1, 63, 0, 0)],
        [((0,), 0, 0, 0, 0), ((0,), 1, 5, 0, 0), ((0,), 6, 20, 0, 0),
         ((0,), 21, 63, 0, 0)],
        # deep successive approximation
        [((0,), 0, 0, 0, 1), ((0,), 0, 0, 1, 0),
         ((0,), 1, 63, 0, 3), ((0,), 1, 63, 3, 2), ((0,), 1, 63, 2, 1),
         ((0,), 1, 63, 1, 0)],
    ]
    for scans in scripts:
        blob = J.encode_progressive_jpeg(coeffs, _quant(), 16, 16, scans=scans)
        got, _ = J.decode_baseline_jpeg(blob, return_coeffs=True)
        assert np.array_equal(got[0], coeffs), scans


def test_progressive_restart_markers():
    """RST markers inside progressive scans: DC predictors reset, EOB
    runs may not span an interval, bit reader re-aligns."""
    rng = np.random.RandomState(66)
    coeffs = _random_coeffs(rng, (3, 3))
    blob = J.encode_progressive_jpeg(coeffs, _quant(), 24, 24, restart_interval=2)
    assert any(bytes([0xFF, 0xD0 + m]) in blob for m in range(8))
    got, _ = J.decode_baseline_jpeg(blob, return_coeffs=True)
    assert np.array_equal(got[0], coeffs)


def test_progressive_dc_arithmetic_shift_on_negatives():
    """G.1.2.1: the DC point transform is an ARITHMETIC shift (floor),
    unlike AC's sign-magnitude. Odd negative DC values are where a
    logical-shift implementation diverges — pin them exactly."""
    coeffs = np.zeros((1, 4, 8, 8), dtype=np.int64)
    coeffs[0, :, 0, 0] = [-53, -1, 1, 53]
    blob = J.encode_progressive_jpeg(coeffs, _quant(), 32, 8)
    got, _ = J.decode_baseline_jpeg(blob, return_coeffs=True)
    assert np.array_equal(got[0], coeffs)


def test_progressive_eob_and_zrl_edge_cases():
    """All-zero AC bands (maximal EOB runs across every block), a lone
    coefficient at zigzag 63 (ZRL chains), and a sparse mid-band value
    that splits an EOB run."""
    coeffs = np.zeros((2, 8, 8, 8), dtype=np.int64)
    coeffs[0, 0, 7, 7] = 5
    coeffs[1, 3, 3, 3] = -9
    coeffs[:, :, 0, 0] = 7
    blob = J.encode_progressive_jpeg(coeffs, _quant(), 64, 16)
    got, _ = J.decode_baseline_jpeg(blob, return_coeffs=True)
    assert np.array_equal(got[0], coeffs)


def test_progressive_encoder_rejects_bad_scripts():
    coeffs = np.zeros((3, 1, 1, 8, 8), dtype=np.int64)
    with pytest.raises(ValueError, match="mix the DC band"):
        J.encode_progressive_jpeg(
            coeffs, _quant(), 8, 8, scans=[((0, 1, 2), 0, 63, 0, 0)]
        )
    with pytest.raises(ValueError, match="single-component"):
        J.encode_progressive_jpeg(
            coeffs, _quant(), 8, 8,
            scans=[((0, 1, 2), 0, 0, 0, 0), ((0, 1), 1, 63, 0, 0)],
        )
    with pytest.raises(ValueError, match="Ah in"):
        J.encode_progressive_jpeg(
            coeffs, _quant(), 8, 8,
            scans=[((0, 1, 2), 0, 0, 0, 2), ((0, 1, 2), 0, 0, 2, 0)],
        )


def test_progressive_gate_closed_form():
    """The media_decode_progressive gate's exact arithmetic: even luma
    v, constant chroma 138 through the FULL default progression at
    4:2:0 decodes to exactly (v+14, v-11, v+18) per pixel."""
    from osm_admin_boundary_conflation_spark.operators.multimodal import (
        build_jpeg_progressive,
    )

    for doc_id in (0, 1, 17):
        img = J.decode_baseline_jpeg(build_jpeg_progressive(doc_id))
        assert img.shape == (32, 32, 3)
        for by in range(4):
            for bx in range(4):
                v = 2 * ((doc_id * 5 + bx * 3 + by * 7) % 100) + 20
                tile = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                assert (tile[:, :, 0] == v + 14).all()
                assert (tile[:, :, 1] == v - 11).all()
                assert (tile[:, :, 2] == v + 18).all()


def test_progressive_fuzz_corruption_never_hangs():
    """Byte-corruption fuzz over a progressive stream: flipped bytes
    must decode or raise cleanly — the multi-scan state machine must
    not loop forever on a truncated/garbled scan."""
    rng = np.random.RandomState(67)
    coeffs = _random_coeffs(rng, (2, 2))
    blob = bytearray(J.encode_progressive_jpeg(coeffs, _quant(), 16, 16))
    for i in range(2, len(blob), max(1, len(blob) // 60)):
        bad = bytearray(blob)
        bad[i] ^= 0x5A
        try:
            J.decode_baseline_jpeg(bytes(bad))
        except (ValueError, NotImplementedError, IndexError, struct.error):
            pass
