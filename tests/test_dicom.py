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
