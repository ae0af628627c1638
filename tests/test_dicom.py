"""Pure-Python DICOM reader against synthesized Part-10 files."""

import struct

import numpy as np
import pytest

from vilmedic_tpu.data.dicom import DicomError, dicom_to_uint8, read_dicom


def _element(group, elem, vr, value: bytes) -> bytes:
    head = struct.pack("<HH", group, elem)
    if vr in (b"OB", b"OW", b"SQ", b"UN", b"UT"):
        return head + vr + b"\x00\x00" + struct.pack("<I", len(value)) + value
    return head + vr + struct.pack("<H", len(value)) + value


def _write_dicom(path, rows=16, cols=16, photometric=b"MONOCHROME2 ",
                 window=None, bits=16):
    rng = np.random.default_rng(0)
    if bits == 16:
        pixels = rng.integers(0, 4096, (rows, cols), dtype=np.uint16)
    else:
        pixels = rng.integers(0, 256, (rows, cols), dtype=np.uint8)
    body = b""
    # file meta (explicit LE): transfer syntax
    ts = b"1.2.840.10008.1.2.1\x00"
    meta = _element(0x0002, 0x0010, b"UI", ts)
    body += meta
    body += _element(0x0028, 0x0002, b"US", struct.pack("<H", 1))
    body += _element(0x0028, 0x0004, b"CS", photometric)
    body += _element(0x0028, 0x0010, b"US", struct.pack("<H", rows))
    body += _element(0x0028, 0x0011, b"US", struct.pack("<H", cols))
    body += _element(0x0028, 0x0100, b"US", struct.pack("<H", bits))
    body += _element(0x0028, 0x0103, b"US", struct.pack("<H", 0))
    if window:
        center, width = window
        body += _element(0x0028, 0x1050, b"DS", f"{center}".encode().ljust(4))
        body += _element(0x0028, 0x1051, b"DS", f"{width}".encode().ljust(4))
    body += _element(0x7FE0, 0x0010, b"OW", pixels.tobytes())
    with open(path, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + body)
    return pixels


def test_read_dicom_roundtrip(tmp_path):
    p = tmp_path / "a.dcm"
    pixels = _write_dicom(str(p))
    arr, attrs = read_dicom(str(p))
    np.testing.assert_array_equal(arr, pixels)
    assert attrs["Rows"] == 16 and attrs["BitsAllocated"] == 16
    assert attrs["PhotometricInterpretation"] == "MONOCHROME2"


def test_dicom_to_uint8_normalization(tmp_path):
    p = tmp_path / "b.dcm"
    pixels = _write_dicom(str(p))
    img = dicom_to_uint8(str(p))
    assert img.dtype == np.uint8
    assert img.max() == 255  # (max(img,0)/img.max())*255 reference semantics
    # proportionality to raw values
    flat_idx = np.unravel_index(np.argmax(pixels), pixels.shape)
    assert img[flat_idx] == 255


def test_dicom_windowing(tmp_path):
    p = tmp_path / "c.dcm"
    _write_dicom(str(p), window=(100, 50))
    img = dicom_to_uint8(str(p))
    assert img.dtype == np.uint8
    # windowed: values clipped into [center-w/2, center+w/2] before scaling
    assert img.min() >= 0 and img.max() == 255


def test_monochrome1_inversion(tmp_path):
    p2 = tmp_path / "m2.dcm"
    p1 = tmp_path / "m1.dcm"
    _write_dicom(str(p2), photometric=b"MONOCHROME2 ", window=(100, 50))
    _write_dicom(str(p1), photometric=b"MONOCHROME1 ", window=(100, 50))
    img2 = dicom_to_uint8(str(p2)).astype(int)
    img1 = dicom_to_uint8(str(p1)).astype(int)
    # inverted relationship: bright in MONO2 is dark in MONO1
    assert np.corrcoef(img1.ravel(), img2.ravel())[0, 1] < -0.9


def test_compressed_rejected(tmp_path):
    p = tmp_path / "x.dcm"
    ts = b"1.2.840.10008.1.2.4.70\x00\x00"  # JPEG lossless
    body = _element(0x0002, 0x0010, b"UI", ts)
    with open(p, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + body)
    with pytest.raises(DicomError):
        read_dicom(str(p))


# ---------------------------------------------------------------------------
# Compressed transfer syntaxes (native codecs)
# ---------------------------------------------------------------------------

def _encode_jpeg_lossless(img: np.ndarray, precision=16, predictor=1) -> bytes:
    """Minimal SOF3 encoder (test-side ground truth for the native decoder):
    single component, one all-length-5 Huffman table for categories 0..16."""
    h, w = img.shape
    img = img.astype(np.int64)

    out = bytearray(b"\xff\xd8")  # SOI
    # DHT: 17 codes of length 5, values 0..16
    bits = [0] * 16
    bits[4] = 17
    dht = bytes([0x00]) + bytes(bits) + bytes(range(17))
    out += b"\xff\xc4" + struct.pack(">H", len(dht) + 2) + dht
    sof = struct.pack(">BHHB", precision, h, w, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc3" + struct.pack(">H", len(sof) + 2) + sof
    sos = bytes([1, 1, 0x00, predictor, 0, 0x00])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    bitbuf, nbits = 0, 0
    payload = bytearray()

    def put(v, count):
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << count) | (v & ((1 << count) - 1))
        nbits += count
        while nbits >= 8:
            nbits -= 8
            b = (bitbuf >> nbits) & 0xFF
            payload.append(b)
            if b == 0xFF:
                payload.append(0x00)

    for r in range(h):
        for c in range(w):
            if r == 0 and c == 0:
                pred = 1 << (precision - 1)
            elif r == 0:
                pred = img[r, c - 1]
            elif c == 0:
                pred = img[r - 1, c]
            else:
                ra, rb, rc_ = img[r, c - 1], img[r - 1, c], img[r - 1, c - 1]
                pred = {1: ra, 2: rb, 3: rc_, 4: ra + rb - rc_,
                        5: ra + ((rb - rc_) >> 1), 6: rb + ((ra - rc_) >> 1),
                        7: (ra + rb) >> 1}[predictor]
            diff = ((int(img[r, c]) - int(pred) + 32768) % 65536) - 32768
            if diff == 0:
                put(0, 5)
            elif diff == -32768:
                put(16, 5)
            else:
                ssss = abs(diff).bit_length()
                put(ssss, 5)
                mag = diff if diff > 0 else diff + (1 << ssss) - 1
                put(mag, ssss)
    if nbits:
        put(0x7F, 8 - nbits)  # pad with 1s... 0s fine for our table
    out += payload + b"\xff\xd9"
    return bytes(out)


def _packbits(data: bytes) -> bytes:
    """Literal-only PackBits encoding (valid per DICOM G.3.1)."""
    out = bytearray()
    for i in range(0, len(data), 128):
        chunk = data[i: i + 128]
        out.append(len(chunk) - 1)
        out += chunk
    return bytes(out)


def _write_encapsulated(path, fragments, transfer_syntax, rows, cols, bits=16,
                        photometric=b"MONOCHROME2 "):
    body = _element(0x0002, 0x0010, b"UI", transfer_syntax.encode() + b"\x00")
    body += _element(0x0028, 0x0002, b"US", struct.pack("<H", 1))
    body += _element(0x0028, 0x0004, b"CS", photometric)
    body += _element(0x0028, 0x0010, b"US", struct.pack("<H", rows))
    body += _element(0x0028, 0x0011, b"US", struct.pack("<H", cols))
    body += _element(0x0028, 0x0100, b"US", struct.pack("<H", bits))
    body += _element(0x0028, 0x0103, b"US", struct.pack("<H", 0))
    # encapsulated PixelData: OB, undefined length, BOT + fragments + delimiter
    body += struct.pack("<HH", 0x7FE0, 0x0010) + b"OB\x00\x00" + struct.pack("<I", 0xFFFFFFFF)
    body += struct.pack("<HHI", 0xFFFE, 0xE000, 0)  # empty Basic Offset Table
    for frag in fragments:
        if len(frag) % 2:
            frag = frag + b"\x00"
        body += struct.pack("<HHI", 0xFFFE, 0xE000, len(frag)) + frag
    body += struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
    with open(path, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + body)


@pytest.mark.parametrize("predictor", [1, 2, 4, 7])
def test_jpeg_lossless_roundtrip(tmp_path, predictor):
    rng = np.random.default_rng(predictor)
    pixels = rng.integers(0, 4096, (23, 17), dtype=np.uint16)
    frag = _encode_jpeg_lossless(pixels, precision=16, predictor=predictor)
    p = tmp_path / "jl.dcm"
    _write_encapsulated(str(p), [frag], "1.2.840.10008.1.2.4.70", 23, 17)
    arr, attrs = read_dicom(str(p))
    np.testing.assert_array_equal(arr, pixels)


def test_jpeg_lossless_multifragment(tmp_path):
    rng = np.random.default_rng(9)
    pixels = rng.integers(0, 1024, (12, 12), dtype=np.uint16)
    frag = _encode_jpeg_lossless(pixels)
    p = tmp_path / "jl2.dcm"
    # split the codestream into two fragments: must concatenate transparently
    _write_encapsulated(str(p), [frag[:100], frag[100:]],
                        "1.2.840.10008.1.2.4.57", 12, 12)
    arr, _ = read_dicom(str(p))
    np.testing.assert_array_equal(arr, pixels)


def test_rle_roundtrip_16bit(tmp_path):
    rng = np.random.default_rng(3)
    pixels = rng.integers(0, 60000, (9, 11), dtype=np.uint16)
    msb = (pixels >> 8).astype(np.uint8).tobytes()
    lsb = (pixels & 0xFF).astype(np.uint8).tobytes()
    seg0, seg1 = _packbits(msb), _packbits(lsb)
    header = struct.pack("<I", 2) + struct.pack(
        "<15I", 64, 64 + len(seg0), *([0] * 13)
    )
    frag = header + seg0 + seg1
    p = tmp_path / "rle.dcm"
    _write_encapsulated(str(p), [frag], "1.2.840.10008.1.2.5", 9, 11)
    arr, _ = read_dicom(str(p))
    np.testing.assert_array_equal(arr, pixels)


def test_jpeg_baseline_via_pillow(tmp_path):
    import io

    from PIL import Image

    rng = np.random.default_rng(4)
    pixels = rng.integers(0, 256, (20, 20), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(pixels, mode="L").save(buf, format="JPEG", quality=95)
    frag = buf.getvalue()
    p = tmp_path / "jb.dcm"
    _write_encapsulated(str(p), [frag], "1.2.840.10008.1.2.4.50", 20, 20, bits=8)
    arr, _ = read_dicom(str(p))
    expected = np.asarray(Image.open(io.BytesIO(frag)))
    np.testing.assert_array_equal(arr, expected)
    img = dicom_to_uint8(str(p))
    assert img.dtype == np.uint8 and img.shape == (20, 20)


def test_undefined_length_sequence_skipped(tmp_path):
    """Real archives carry undefined-length SQ elements before PixelData."""
    pixels = np.arange(16, dtype=np.uint16).reshape(4, 4)
    body = _element(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2.1\x00")
    body += _element(0x0028, 0x0010, b"US", struct.pack("<H", 4))
    body += _element(0x0028, 0x0011, b"US", struct.pack("<H", 4))
    body += _element(0x0028, 0x0100, b"US", struct.pack("<H", 16))
    # undefined-length SQ with one undefined-length item holding an element
    inner = _element(0x0008, 0x0100, b"SH", b"CODE")
    sq = struct.pack("<HH", 0x0008, 0x1140) + b"SQ\x00\x00" + struct.pack("<I", 0xFFFFFFFF)
    sq += struct.pack("<HHI", 0xFFFE, 0xE000, 0xFFFFFFFF)
    sq += inner
    sq += struct.pack("<HHI", 0xFFFE, 0xE00D, 0)
    sq += struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
    body += sq
    body += _element(0x7FE0, 0x0010, b"OW", pixels.tobytes())
    p = tmp_path / "sq.dcm"
    with open(p, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + body)
    arr, _ = read_dicom(str(p))
    np.testing.assert_array_equal(arr, pixels)
