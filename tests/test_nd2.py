"""ND2 reader tests against a spec-conforming synthetic writer.

No Nikon sample corpus is available offline, so the fixture writer below
produces files following the ND2 v3 chunk layout documented in
core/nd2.py (the same layout the open-source nd2/nd2reader projects
parse). It deliberately lives in tests: product code only reads.
"""

import struct

import numpy as np
import pytest

from tmat_tpu.core import io as tio
from tmat_tpu.core.nd2 import (
    CHUNK_MAGIC,
    FILE_SIGNATURE_NAME,
    FILEMAP_SIGNATURE,
    ND2Reader,
    read_nd2,
)


# --------------------------------------------------------------------------
# Synthetic writer
# --------------------------------------------------------------------------


def _chunk(name: bytes, payload: bytes) -> bytes:
    header = struct.pack("<IIQ", CHUNK_MAGIC, len(name), len(payload))
    return header + name + payload


def _lv_item(name: str, value) -> bytes:
    raw_name = (name + "\x00").encode("utf-16-le")
    head = lambda t: struct.pack("<BB", t, len(name) + 1) + raw_name
    if isinstance(value, bool):
        return head(1) + struct.pack("<B", value)
    if isinstance(value, int):
        return head(3) + struct.pack("<I", value)
    if isinstance(value, float):
        return head(6) + struct.pack("<d", value)
    if isinstance(value, str):
        return head(8) + value.encode("utf-16-le") + b"\x00\x00"
    if isinstance(value, bytes):
        return head(9) + struct.pack("<Q", len(value)) + value
    if isinstance(value, dict):
        payload = b"".join(_lv_item(k, v) for k, v in value.items())
        return head(11) + struct.pack("<IQ", len(value), len(payload)) + payload
    raise TypeError(type(value))


def _lv(tree: dict) -> bytes:
    return b"".join(_lv_item(k, v) for k, v in tree.items())


def write_nd2(path, stack: np.ndarray, calibration=0.65, z_step=2.0):
    """Write (Z, Y, X) or (Z, Y, X, C) uint8/uint16 data as an ND2 file."""
    if stack.ndim == 3:
        stack = stack[..., None]
    n_z, height, width, n_comp = stack.shape
    bpc = stack.dtype.itemsize * 8

    chunks = []
    chunks.append((FILE_SIGNATURE_NAME, b"Ver3.0\x00"))
    attrs = _lv(
        {
            "SLxImageAttributes": {
                "uiWidth": width,
                "uiHeight": height,
                "uiComp": n_comp,
                "uiBpcInMemory": bpc,
                "uiSequenceCount": n_z,
            }
        }
    )
    chunks.append((b"ImageAttributesLV!", attrs))
    meta = _lv(
        {
            "SLxPictureMetadata": {
                "dCalibration": float(calibration),
                "dZStep": float(z_step),
                "sDescription": "synthetic fixture",
            }
        }
    )
    chunks.append((b"ImageMetadataSeqLV|0!", meta))
    for z in range(n_z):
        frame = np.ascontiguousarray(stack[z])
        payload = struct.pack("<d", 0.1 * z) + frame.tobytes()
        chunks.append((b"ImageDataSeq|%d!" % z, payload))

    buf = bytearray()
    offsets = {}
    for name, payload in chunks:
        offsets[name] = len(buf)
        buf += _chunk(name, payload)

    # chunk map: [name][u64 offset][u64 length] ..., terminated by signature
    map_payload = bytearray()
    for name, payload in chunks[1:]:  # signature chunk is not mapped
        map_payload += name
        map_payload += struct.pack("<QQ", offsets[name], len(payload))
    map_payload += FILEMAP_SIGNATURE
    map_offset = len(buf)
    buf += _chunk(FILEMAP_SIGNATURE, bytes(map_payload))
    buf += FILEMAP_SIGNATURE + struct.pack("<Q", map_offset)
    with open(path, "wb") as fp:
        fp.write(bytes(buf))


# --------------------------------------------------------------------------
# Tests
# --------------------------------------------------------------------------


@pytest.fixture
def zstack(rng):
    return rng.randint(0, 65535, size=(4, 24, 32)).astype(np.uint16)


def test_read_nd2_roundtrip(tmp_path, zstack):
    path = tmp_path / "stack.nd2"
    write_nd2(path, zstack, calibration=0.65, z_step=2.5)
    arr, px = read_nd2(path)
    assert arr.shape == (4, 1, 24, 32)
    np.testing.assert_array_equal(arr[:, 0], zstack)
    assert px["X"] == pytest.approx(0.65)
    assert px["Y"] == pytest.approx(0.65)
    assert px["Z"] == pytest.approx(2.5)


def test_read_nd2_multichannel(tmp_path, rng):
    stack = rng.randint(0, 255, size=(3, 16, 20, 2)).astype(np.uint8)
    path = tmp_path / "mc.nd2"
    write_nd2(path, stack)
    reader = ND2Reader(path)
    assert reader.components == 2
    arr = reader.asarray()
    assert arr.shape == (3, 2, 16, 20)
    np.testing.assert_array_equal(arr[:, 0], stack[..., 0])
    np.testing.assert_array_equal(arr[:, 1], stack[..., 1])


def test_load_image_nd2_zyx_contract(tmp_path, zstack):
    """load_image returns ZYX + PhysicalPixelSizes for .nd2, like the
    reference's aicsimageio path (helper.py:23-95)."""
    path = tmp_path / "stack.nd2"
    write_nd2(path, zstack, calibration=1.3, z_step=4.0)
    img, sizes = tio.load_image(str(path))
    assert img.shape == (4, 24, 32)
    np.testing.assert_array_equal(img, zstack)
    assert sizes.X == pytest.approx(1.3)
    assert sizes.Z == pytest.approx(4.0)


def test_load_image_nd2_multichannel_requires_c(tmp_path, rng):
    stack = rng.randint(0, 255, size=(2, 8, 8, 3)).astype(np.uint8)
    path = tmp_path / "mc.nd2"
    write_nd2(path, stack)
    with pytest.raises(ValueError, match="multi channel"):
        tio.load_image(str(path))
    img, _ = tio.load_image(str(path), C=1)
    np.testing.assert_array_equal(img, stack[..., 1])


def test_nd2_dims(tmp_path, zstack):
    path = tmp_path / "stack.nd2"
    write_nd2(path, zstack)
    dims = tio.get_image_dims(str(path))
    assert (dims.T, dims.C, dims.Z, dims.Y, dims.X) == (1, 1, 4, 24, 32)


def test_non_nd2_rejected(tmp_path):
    path = tmp_path / "fake.nd2"
    path.write_bytes(b"not an nd2 file at all" * 10)
    with pytest.raises(SystemExit):
        tio.load_image(str(path))
