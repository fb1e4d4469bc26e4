"""Minimal pure-Python HDF5 writer (v0 superblock, v1 object headers,
symbol-table root group) — enough to round-trip the structures the
minimal reader in sources/hdf5.py decodes: contiguous or CHUNKED
numeric datasets (optionally shuffle+deflate filtered, the layout real
gzip'd ICEYE SLC products use) and fixed-length scalar strings.

Purpose: fixture generation for the chunked-decode path in containers
without h5py (there is no other way to produce a chunked HDF5 file
in-sandbox), and a dependency-free interchange sink for small cube
exports. It is NOT the scale path — parquet is (the writer is a
single-buffer builder); files it produces are spec-conformant v0
files that h5py/xarray can also open where those libs exist.

Format reference: the public HDF5 File Format Specification v2
(superblock v0, object header v1, B-tree v1, local heap, SNOD),
mirrored by the reader in sources/hdf5.py.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_UNDEF = 0xFFFFFFFFFFFFFFFF


def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 8)


def _dtype_message(dt: np.dtype) -> bytes:
    """Datatype message body for little-endian ints and floats, and
    fixed-length byte strings."""
    if dt.kind == "S":
        # class 3 (string), version 1; null-padded, ASCII
        return struct.pack("<BBBBI", 0x13, 0, 0, 0, dt.itemsize)
    size = dt.itemsize
    bits = size * 8
    if dt.kind in ("i", "u"):
        b0 = 0x08 if dt.kind == "i" else 0x00
        body = struct.pack("<BBBBI", 0x10, b0, 0, 0, size)
        body += struct.pack("<HH", 0, bits)
        return body
    if dt.kind == "f":
        if size == 4:
            exp_loc, exp_sz, man_sz, bias, sign = 23, 8, 23, 127, 31
        elif size == 8:
            exp_loc, exp_sz, man_sz, bias, sign = 52, 11, 52, 1023, 63
        else:
            raise NotImplementedError(f"float{bits} write unsupported")
        # bitfield0: mantissa normalization = 2 (MSB implied), LE
        body = struct.pack("<BBBBI", 0x11, 0x20, sign, 0, size)
        body += struct.pack("<HHBBBBI", 0, bits, exp_loc, exp_sz, 0, man_sz, bias)
        return body
    raise NotImplementedError(f"dtype {dt} write unsupported")


def _dataspace_message(shape: tuple[int, ...]) -> bytes:
    body = struct.pack("<BBBB4x", 1, len(shape), 0, 0)
    for s in shape:
        body += struct.pack("<Q", s)
    return body


def _message(mtype: int, body: bytes) -> bytes:
    body = _pad8(body)
    return struct.pack("<HHB3x", mtype, len(body), 0) + body


def _object_header(messages: list[bytes]) -> bytes:
    blob = b"".join(messages)
    return (
        struct.pack("<BBHII4x", 1, 0, len(messages), 1, len(blob)) + blob
    )


def _filters_message(itemsize: int, shuffle: bool, level: int) -> bytes:
    filters = []
    if shuffle:
        filters.append((2, [itemsize]))
    filters.append((1, [level]))
    body = struct.pack("<BB6x", 1, len(filters))
    for fid, cdata in filters:
        body += struct.pack("<HHHH", fid, 0, 0, len(cdata))
        for c in cdata:
            body += struct.pack("<I", c)
        if len(cdata) % 2:
            body += b"\x00" * 4
    return body


def _apply_filters(raw: bytes, itemsize: int, shuffle: bool, level: int) -> bytes:
    if shuffle:
        arr = np.frombuffer(raw, dtype="u1")
        n = len(raw) // itemsize
        raw = arr[: n * itemsize].reshape(n, itemsize).T.tobytes()
    return zlib.compress(raw, level)


class _Builder:
    def __init__(self) -> None:
        self.buf = bytearray(96)  # superblock patched at the end

    def append(self, blob: bytes) -> int:
        addr = len(self.buf)
        self.buf += blob
        return addr


def write_h5(
    datasets: dict[str, "np.ndarray | str"],
    chunks: dict[str, tuple[int, ...]] | None = None,
    compress: bool = False,
    shuffle: bool = False,
    level: int = 6,
) -> bytes:
    """Serialize {name: ndarray | str} into an HDF5 v0 file. Datasets
    named in `chunks` are written chunked (with shuffle+deflate when
    `compress`); everything else is contiguous. Strings become
    fixed-length scalar datasets."""
    chunks = chunks or {}
    b = _Builder()
    entries: list[tuple[str, int]] = []  # (name, objhdr addr)

    for name in datasets:
        val = datasets[name]
        if isinstance(val, str):
            raw = val.encode() + b"\x00"
            dt = np.dtype(f"S{len(raw)}")
            addr = b.append(raw)
            msgs = [
                _message(0x01, _dataspace_message(())),
                _message(0x03, _dtype_message(dt)),
                _message(0x08, struct.pack("<BBQQ", 3, 1, addr, len(raw))),
            ]
            entries.append((name, b.append(_object_header(msgs))))
            continue

        arr = np.ascontiguousarray(val)
        if arr.dtype.byteorder == ">":
            arr = arr.astype(arr.dtype.newbyteorder("<"))
        cdims = chunks.get(name)
        if cdims is None:
            raw = arr.tobytes()
            addr = b.append(raw)
            msgs = [
                _message(0x01, _dataspace_message(arr.shape)),
                _message(0x03, _dtype_message(arr.dtype)),
                _message(0x08, struct.pack("<BBQQ", 3, 1, addr, len(raw))),
            ]
        else:
            if len(cdims) != arr.ndim:
                raise ValueError("chunk rank != dataset rank")
            # write chunks, then their B-tree
            chunk_addrs = []
            grid = [range(0, s, c) for s, c in zip(arr.shape, cdims)]
            offsets: list[tuple[int, ...]] = [()]
            for axis in grid:
                offsets = [o + (i,) for o in offsets for i in axis]
            for offs in offsets:
                sl = tuple(
                    slice(o, min(o + c, s))
                    for o, c, s in zip(offs, cdims, arr.shape)
                )
                block = np.zeros(cdims, arr.dtype)
                src = arr[sl]
                block[tuple(slice(0, x) for x in src.shape)] = src
                raw = block.tobytes()
                if compress:
                    raw = _apply_filters(
                        raw, arr.dtype.itemsize, shuffle, level
                    )
                chunk_addrs.append((offs, len(raw), b.append(raw)))
            rank = arr.ndim
            node = bytearray()
            node += b"TREE" + struct.pack("<BBHQQ", 1, 0, len(chunk_addrs), _UNDEF, _UNDEF)
            for offs, nbytes, caddr in chunk_addrs:
                node += struct.pack("<II", nbytes, 0)
                for o in offs:
                    node += struct.pack("<Q", o)
                node += struct.pack("<Q", 0)  # element-size dim offset
                node += struct.pack("<Q", caddr)
            # trailing key: one past the last chunk in every dimension
            node += struct.pack("<II", 0, 0)
            for s, c in zip(arr.shape, cdims):
                node += struct.pack("<Q", ((s + c - 1) // c) * c)
            node += struct.pack("<Q", 0)
            btree = b.append(bytes(node))
            layout = struct.pack("<BBBQ", 3, 2, rank + 1, btree)
            for c in cdims:
                layout += struct.pack("<I", c)
            layout += struct.pack("<I", arr.dtype.itemsize)
            msgs = [
                _message(0x01, _dataspace_message(arr.shape)),
                _message(0x03, _dtype_message(arr.dtype)),
                _message(0x08, layout),
            ]
            if compress:
                msgs.append(
                    _message(
                        0x0B,
                        _filters_message(arr.dtype.itemsize, shuffle, level),
                    )
                )
        entries.append((name, b.append(_object_header(msgs))))

    # root group: local heap (names), SNOD, group B-tree, object header
    heap_data = bytearray(b"\x00" * 8)
    name_offs: dict[str, int] = {}
    for name, _ in sorted(entries):
        name_offs[name] = len(heap_data)
        heap_data += _pad8(name.encode() + b"\x00")
    heap_data_addr = b.append(bytes(heap_data))
    heap = b.append(
        b"HEAP"
        + struct.pack("<B3xQQQ", 0, len(heap_data), _UNDEF, heap_data_addr)
    )
    snod = bytearray(b"SNOD" + struct.pack("<BBH", 1, 0, len(entries)))
    for name, hdr in sorted(entries):
        snod += struct.pack("<QQII16x", name_offs[name], hdr, 0, 0)
    snod_addr = b.append(bytes(snod))
    last_name = max(name_offs.values()) if name_offs else 0
    gtree = (
        b"TREE"
        + struct.pack("<BBHQQ", 0, 0, 1, _UNDEF, _UNDEF)
        + struct.pack("<QQQ", 0, snod_addr, last_name)
    )
    gtree_addr = b.append(gtree)
    root_hdr = b.append(
        _object_header([_message(0x11, struct.pack("<QQ", gtree_addr, heap))])
    )

    sb = bytearray(96)
    sb[0:8] = b"\x89HDF\r\n\x1a\n"
    sb[13] = 8
    sb[14] = 8
    struct.pack_into("<HHI", sb, 16, 4, 16, 0)
    struct.pack_into("<QQQQ", sb, 24, 0, _UNDEF, len(b.buf), _UNDEF)
    struct.pack_into("<QQII", sb, 56, 0, root_hdr, 0, 0)
    b.buf[0:96] = sb
    return bytes(b.buf)
