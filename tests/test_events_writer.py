"""TensorBoard event-writer format tests: crc32c known vectors, TFRecord
framing round-trip, and protobuf scalar decoding."""

import struct

import pytest

from multimodal_content_moderation_tpu.utils.events import (
    EventWriter,
    _crc32c,
    _masked_crc,
)


def test_crc32c_known_vectors():
    # canonical Castagnoli test vectors
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"") == 0x0
    assert _crc32c(b"\x00" * 32) == 0x8A9136AA


def test_masked_crc_formula():
    # mask(crc) = rot15(crc) + 0xa282ead8 (TFRecord spec)
    crc = _crc32c(b"123456789")
    rot = ((crc >> 15) | (crc << 17)) & 0xFFFFFFFF
    assert _masked_crc(b"123456789") == (rot + 0xA282EAD8) & 0xFFFFFFFF


def _read_records(path):
    """Parse TFRecord framing, verifying both CRCs."""
    records = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if not header:
                break
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", f.read(4))
            assert hcrc == _masked_crc(header), "header crc mismatch"
            payload = f.read(length)
            (pcrc,) = struct.unpack("<I", f.read(4))
            assert pcrc == _masked_crc(payload), "payload crc mismatch"
            records.append(payload)
    return records


def test_event_file_roundtrip(tmp_path):
    with EventWriter(str(tmp_path)) as w:
        w.scalar("train/loss", 0.5, 10)
        w.scalar("eval/f1", 0.25, 20)
        path = w.path

    records = _read_records(path)
    assert len(records) == 3  # file_version + 2 scalars
    assert b"brain.Event:2" in records[0]
    assert b"train/loss" in records[1]
    # simple_value 0.25 as little-endian f32 appears in the payload
    assert struct.pack("<f", 0.25) in records[2]
    # step varint 20 (field 2, wire 0 -> key 0x10)
    assert bytes([0x10, 20]) in records[2]
