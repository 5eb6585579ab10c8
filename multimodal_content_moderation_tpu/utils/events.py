"""Minimal TensorBoard-compatible scalar event writer (zero dependencies).

The reference logs through HF Trainer's tensorboard integration
(``report_to=tensorboard``, scripts/train.py:290). This environment has no
tensorboard package, so this module hand-encodes the two protobuf messages a
scalar stream needs (``Event`` and ``Summary``) plus the TFRecord framing
(length + masked crc32c), producing ``events.out.tfevents.*`` files any
standard TensorBoard install can read.
"""

from __future__ import annotations

import os
import socket
import struct
import time
from typing import Optional

import numpy as np

# --- crc32c (Castagnoli), table-driven ------------------------------------

_POLY = 0x82F63B78
_TABLE = np.zeros(256, np.uint32)
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ _POLY if _c & 1 else _c >> 1
    _TABLE[_i] = _c


def _crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    arr = np.frombuffer(data, np.uint8)
    table = _TABLE
    for b in arr:
        crc = int(table[(crc ^ int(b)) & 0xFF]) ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    # TFRecord masking: rotate right by 15, then ADD the masking delta.
    crc = _crc32c(data)
    rot = ((crc >> 15) | (crc << 17)) & 0xFFFFFFFF
    return (rot + 0xA282EAD8) & 0xFFFFFFFF


# --- tiny protobuf encoding -------------------------------------------------


def _varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            out += bytes([b])
            return out


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_field(field: int, payload: bytes) -> bytes:
    return _key(field, 2) + _varint(len(payload)) + payload


def _float_field(field: int, value: float) -> bytes:
    return _key(field, 5) + struct.pack("<f", value)


def _double_field(field: int, value: float) -> bytes:
    return _key(field, 1) + struct.pack("<d", value)


def _int_field(field: int, value: int) -> bytes:
    return _key(field, 0) + _varint(value)


def _scalar_event(tag: str, value: float, step: int, wall: float) -> bytes:
    # Summary.Value{ tag=1, simple_value=2 }
    sv = _len_field(1, tag.encode()) + _float_field(2, value)
    summary = _len_field(1, sv)  # Summary{ value=1 repeated }
    # Event{ wall_time=1(double), step=2(int64), summary=5 }
    return _double_field(1, wall) + _int_field(2, step) + _len_field(5, summary)


def _file_version_event(wall: float) -> bytes:
    return _double_field(1, wall) + _len_field(3, b"brain.Event:2")


class EventWriter:
    """Append-only scalar event file writer."""

    def __init__(self, log_dir: str, suffix: Optional[str] = None):
        os.makedirs(log_dir, exist_ok=True)
        name = f"events.out.tfevents.{int(time.time())}.{socket.gethostname()}"
        if suffix:
            name += f".{suffix}"
        self.path = os.path.join(log_dir, name)
        self._f = open(self.path, "ab")
        self._write_record(_file_version_event(time.time()))

    def _write_record(self, payload: bytes) -> None:
        header = struct.pack("<Q", len(payload))
        self._f.write(header)
        self._f.write(struct.pack("<I", _masked_crc(header)))
        self._f.write(payload)
        self._f.write(struct.pack("<I", _masked_crc(payload)))

    def scalar(self, tag: str, value: float, step: int) -> None:
        self._write_record(_scalar_event(tag, float(value), step, time.time()))

    def flush(self) -> None:
        self._f.flush()

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
