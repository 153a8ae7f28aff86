"""Minimal pure-Python HDF5 writer/reader (classic format).

This container ships no HDF5 library (no h5py/libhdf5), but the
reference's second binary produces a real ``.h5`` SONATA file
(``src/circuit/sonata_file.cpp:45-143``).  Rather than leaving
``export_hdf5`` permanently gated on an absent dependency, this module
implements the small slice of the PUBLIC HDF5 File Format
Specification (classic/v0 layout, the format libhdf5 has written since
HDF5 1.0) that a SONATA edge file needs:

- superblock version 0;
- version-1 object headers (no checksums anywhere in the classic
  structures);
- old-style groups: v1 B-tree + local heap + symbol-table node, one
  SNOD per group (capacity 2·K = 32 links — SONATA groups stay far
  below);
- contiguous 1-D/2-D datasets of signed integers, IEEE floats and
  fixed-length ASCII strings;
- scalar string / int64 attributes on groups and datasets.

Everything is little-endian with 8-byte offsets/lengths, matching what
libhdf5 emits on commodity hardware.  The sibling :class:`MiniH5Reader`
parses the same slice independently (from the spec, not by sharing the
writer's serializers) so tests can round-trip without h5py; when h5py
IS present, ``tests/test_sonata.py`` validates the written file with
it too.

This is deliberately NOT a general HDF5 implementation: no chunking,
compression, variable-length types, >32-link groups, or mutation.
"""

from __future__ import annotations

import struct

import numpy as np

UNDEF = 0xFFFFFFFFFFFFFFFF
_K = 16  # group B-tree leaf K -> one SNOD holds up to 2K=32 links
_SNOD_CAP = 2 * _K


def _pad8(n: int) -> int:
    return (n + 7) & ~7


def _padded(b: bytes) -> bytes:
    return b + b"\x00" * (_pad8(len(b)) - len(b))


# --- datatype / dataspace message bodies (spec layout IV.A.2) ---------------


def _dt_fixed(size: int) -> bytes:
    # class 0 fixed-point, version 1; LE, signed (bit 3)
    return struct.pack(
        "<B3BI2H", 0x10, 0x08, 0, 0, size, 0, 8 * size
    )


def _dt_float(size: int) -> bytes:
    # class 1 float, version 1; LE, implied-MSB mantissa, IEEE layout
    if size == 4:
        sign, exp_loc, exp_sz, man_sz, bias = 31, 23, 8, 23, 127
    elif size == 8:
        sign, exp_loc, exp_sz, man_sz, bias = 63, 52, 11, 52, 1023
    else:  # pragma: no cover - guarded by _datatype
        raise ValueError(size)
    return struct.pack(
        "<B3BI2H4BI",
        0x11, 0x20, sign, 0, size, 0, 8 * size,
        exp_loc, exp_sz, 0, man_sz, bias,
    )


def _dt_string(size: int) -> bytes:
    # class 3 string, version 1; null-terminated, ASCII
    return struct.pack("<B3BI", 0x13, 0, 0, 0, size)


def _datatype(dtype: np.dtype) -> bytes:
    if dtype.kind == "i":
        return _dt_fixed(dtype.itemsize)
    if dtype.kind == "f":
        return _dt_float(dtype.itemsize)
    if dtype.kind == "S":
        return _dt_string(max(dtype.itemsize, 1))
    raise TypeError(
        f"MiniH5 supports signed int / float / fixed-string data, got {dtype}"
    )


def _dataspace(shape: tuple[int, ...]) -> bytes:
    body = struct.pack("<BBB5x", 1, len(shape), 0)
    for d in shape:
        body += struct.pack("<Q", d)
    return body


def _attr_message(name: str, value) -> bytes:
    """Attribute message body (version 1): scalar string or int64."""
    if isinstance(value, (bytes, str)):
        raw = value.encode() if isinstance(value, str) else value
        if b"\x00" in raw:
            raise ValueError(
                "HDF5 null-terminated strings cannot contain NUL bytes"
            )
        dt = _dt_string(max(len(raw), 1))
        data = raw
    elif isinstance(value, (int, np.integer)):
        dt = _dt_fixed(8)
        data = struct.pack("<q", int(value))
    elif isinstance(value, float):
        dt = _dt_float(8)
        data = struct.pack("<d", value)
    else:
        raise TypeError(f"unsupported attribute type {type(value)}")
    ds = _dataspace(())  # scalar
    nm = name.encode() + b"\x00"
    body = struct.pack("<BBHHH", 1, 0, len(nm), len(dt), len(ds))
    body += _padded(nm) + _padded(dt) + _padded(ds) + data
    return body


def _message(mtype: int, body: bytes) -> bytes:
    body = _padded(body)
    return struct.pack("<HHB3x", mtype, len(body), 0) + body


def _object_header(messages: list[bytes]) -> bytes:
    data = b"".join(messages)
    return struct.pack("<BBHII4x", 1, 0, len(messages), 1, len(data)) + data


class _Node:
    def __init__(self, name: str):
        self.name = name
        self.attrs: dict[str, object] = {}
        self.addr = 0  # object header address, assigned at write


class _Group(_Node):
    def __init__(self, name: str):
        super().__init__(name)
        self.children: dict[str, _Node] = {}


class _Dataset(_Node):
    def __init__(self, name: str, data: np.ndarray):
        super().__init__(name)
        if data.dtype.kind not in "ifS":
            raise TypeError(f"unsupported dataset dtype {data.dtype}")
        if data.dtype.kind in "if" and data.dtype.byteorder == ">":
            data = data.astype(data.dtype.newbyteorder("<"))
        if data.dtype == np.dtype("S0"):  # all-empty strings
            data = data.astype("S1")
        self.data = np.ascontiguousarray(data)
        self.shape = self.data.shape
        self.nbytes = self.data.nbytes


class _Placeholder(_Dataset):
    """A dataset whose METADATA (shape, dtype, layout address) is
    written by the driver but whose data region is left zero-filled for
    out-of-process writers to fill at the layout offset afterwards —
    the minimal-HDF5 analogue of creating a dataset collectively and
    hyperslab-writing it per rank (reference
    ``src/circuit/sonata_file.cpp:98-101,123-143``)."""

    def __init__(self, name: str, shape: tuple[int, ...], dtype):
        dt = np.dtype(dtype)
        # zero-row probe array carries dtype/itemsize through the
        # normal _Dataset checks; shape/nbytes come from the declared
        # shape instead of the array
        super().__init__(name, np.zeros(0, dtype=dt))
        self.shape = tuple(int(s) for s in shape)
        self.nbytes = int(np.prod(self.shape)) * self.data.dtype.itemsize


class MiniH5Writer:
    """Write-once builder: ``create_group`` / ``create_dataset`` /
    ``set_attr``, then ``write(path)`` serializes the whole file."""

    def __init__(self):
        self.root = _Group("")

    # -- construction -----------------------------------------------------
    def _walk(self, path: str, create: bool) -> _Node:
        node: _Node = self.root
        for part in [p for p in path.strip("/").split("/") if p]:
            if not isinstance(node, _Group):
                raise ValueError(f"{path!r}: {node.name!r} is a dataset")
            if part not in node.children:
                if not create:
                    raise KeyError(path)
                node.children[part] = _Group(part)
            node = node.children[part]
        return node

    def create_group(self, path: str) -> None:
        self._walk(path, create=True)

    def _dataset_parent(self, path: str) -> tuple[_Group, str]:
        parts = path.strip("/").split("/")
        parent = self._walk("/".join(parts[:-1]), create=True)
        if not isinstance(parent, _Group):
            raise ValueError(
                f"{path!r}: parent {parent.name!r} is a dataset, not a group"
            )
        if parts[-1] in parent.children:
            raise ValueError(f"{path!r} already exists")
        return parent, parts[-1]

    def create_dataset(self, path: str, data) -> None:
        parent, name = self._dataset_parent(path)
        arr = np.asarray(data)
        if arr.dtype.kind == "U":
            arr = arr.astype("S")
        if arr.dtype.kind == "O":
            arr = np.asarray(
                [v.encode() if isinstance(v, str) else v for v in arr],
                dtype="S",
            )
        parent.children[name] = _Dataset(name, arr)

    def create_placeholder(
        self, path: str, shape: tuple[int, ...], dtype
    ) -> None:
        """Declare a dataset by shape/dtype only: ``write()`` lays out
        its metadata and zero-fills its data region; the assigned file
        offset is available in :attr:`data_offsets` afterwards so
        external processes can fill the region in parallel."""
        parent, name = self._dataset_parent(path)
        parent.children[name] = _Placeholder(name, shape, dtype)

    def set_attr(self, path: str, name: str, value) -> None:
        self._walk(path, create=True).attrs[name] = value

    # -- serialization ----------------------------------------------------
    def _group_blocks(self, g: _Group) -> dict:
        """Pre-size the group's heap/btree/snod (addresses patched later)."""
        names = sorted(g.children)
        if len(names) > _SNOD_CAP:
            raise ValueError(
                f"MiniH5 group {g.name!r} has {len(names)} links; "
                f"max {_SNOD_CAP}"
            )
        heap_off, offs = 8, {}
        for n in names:
            offs[n] = heap_off
            heap_off += _pad8(len(n) + 1)
        return {
            "names": names,
            "name_off": offs,
            "heap_data_size": max(heap_off, 8),
        }

    def write(self, path: str) -> None:
        groups: list[_Group] = []
        datasets: list[_Dataset] = []
        full_path: dict[int, str] = {}

        def collect(n: _Node, prefix: str):
            full_path[id(n)] = prefix or "/"
            if isinstance(n, _Group):
                groups.append(n)
                for c in sorted(n.children):
                    collect(n.children[c], f"{prefix}/{c}")
            else:
                datasets.append(n)  # type: ignore[arg-type]

        collect(self.root, "")

        meta = {id(g): self._group_blocks(g) for g in groups}
        btree_size = 24 + (2 * _K + 1) * 8 + 2 * _K * 8
        snod_size = 8 + _SNOD_CAP * 40

        # one sequential address-assignment pass
        pos = 96  # superblock v0 incl. root symbol-table entry

        def take(n: int) -> int:
            nonlocal pos
            a = pos
            pos += _pad8(n)
            return a

        layout: dict[int, dict] = {}
        for g in groups:
            m = meta[id(g)]
            ohdr = _object_header(
                [_message(0x0011, struct.pack("<QQ", 0, 0))]
                + [
                    _message(0x000C, _attr_message(k, v))
                    for k, v in sorted(g.attrs.items())
                ]
            )
            g.addr = take(len(ohdr))
            layout[id(g)] = {
                "ohdr_size": len(ohdr),
                "heap": take(32),
                "heap_data": take(m["heap_data_size"]),
                "btree": take(btree_size),
                "snod": take(snod_size),
            }
        for d in datasets:
            body_msgs = [
                _message(0x0001, _dataspace(d.shape)),
                _message(0x0003, _datatype(d.data.dtype)),
                _message(
                    0x0008,
                    struct.pack("<BBQQ", 3, 1, 0, d.nbytes),
                ),
            ] + [
                _message(0x000C, _attr_message(k, v))
                for k, v in sorted(d.attrs.items())
            ]
            ohdr = _object_header(body_msgs)
            d.addr = take(len(ohdr))
            layout[id(d)] = {
                "ohdr_size": len(ohdr),
                "data": take(max(d.nbytes, 8)),
            }
        eof = pos

        buf = bytearray(eof)

        def put(addr: int, b: bytes):
            buf[addr:addr + len(b)] = b

        # superblock v0
        sb = b"\x89HDF\r\n\x1a\n"
        sb += struct.pack("<4B", 0, 0, 0, 0)          # versions
        sb += struct.pack("<BBBB", 0, 8, 8, 0)        # shared-ver, sizes
        sb += struct.pack("<HH", _K, _K)              # leaf K, internal K
        sb += struct.pack("<I", 0)                    # consistency flags
        sb += struct.pack("<QQQQ", 0, UNDEF, eof, UNDEF)
        # root symbol-table entry
        sb += struct.pack("<QQII16x", 0, self.root.addr, 0, 0)
        assert len(sb) == 96
        put(0, sb)

        for g in groups:
            m, lay = meta[id(g)], layout[id(g)]
            ohdr = _object_header(
                [
                    _message(
                        0x0011,
                        struct.pack("<QQ", lay["btree"], lay["heap"]),
                    )
                ]
                + [
                    _message(0x000C, _attr_message(k, v))
                    for k, v in sorted(g.attrs.items())
                ]
            )
            assert len(ohdr) == lay["ohdr_size"]
            put(g.addr, ohdr)
            # local heap header + data
            put(
                lay["heap"],
                b"HEAP" + struct.pack(
                    "<B3xQQQ", 0, m["heap_data_size"], 1, lay["heap_data"]
                ),
            )
            hd = bytearray(m["heap_data_size"])
            for n in m["names"]:
                off = m["name_off"][n]
                hd[off:off + len(n) + 1] = n.encode() + b"\x00"
            put(lay["heap_data"], bytes(hd))
            # v1 B-tree: one leaf pointing at the single SNOD
            bt = b"TREE" + struct.pack("<BBH", 0, 0, 1)
            bt += struct.pack("<QQ", UNDEF, UNDEF)
            last_key = (
                m["name_off"][m["names"][-1]] if m["names"] else 0
            )
            bt += struct.pack("<QQQ", 0, lay["snod"], last_key)
            bt += b"\x00" * (btree_size - len(bt))
            put(lay["btree"], bt)
            # SNOD with one entry per child, name-sorted
            sn = b"SNOD" + struct.pack("<BBH", 1, 0, len(m["names"]))
            for n in m["names"]:
                sn += struct.pack(
                    "<QQII16x", m["name_off"][n], g.children[n].addr, 0, 0
                )
            sn += b"\x00" * (snod_size - len(sn))
            put(lay["snod"], sn)

        self.data_offsets: dict[str, dict] = {}
        for d in datasets:
            lay = layout[id(d)]
            msgs = [
                _message(0x0001, _dataspace(d.shape)),
                _message(0x0003, _datatype(d.data.dtype)),
                _message(
                    0x0008,
                    struct.pack("<BBQQ", 3, 1, lay["data"], d.nbytes),
                ),
            ] + [
                _message(0x000C, _attr_message(k, v))
                for k, v in sorted(d.attrs.items())
            ]
            ohdr = _object_header(msgs)
            assert len(ohdr) == lay["ohdr_size"]
            put(d.addr, ohdr)
            if not isinstance(d, _Placeholder):
                put(lay["data"], d.data.tobytes())
            self.data_offsets[full_path[id(d)]] = {
                "offset": lay["data"],
                "dtype": d.data.dtype.str,
                "shape": d.shape,
            }

        with open(path, "wb") as f:
            f.write(bytes(buf))


# --------------------------------------------------------------------------
# Independent reader for the same format slice (round-trip verification).
# --------------------------------------------------------------------------


class MiniH5Reader:
    """Parse the classic-format slice written above — independently,
    from the public spec, so the round-trip test is two implementations
    agreeing rather than one function inverting itself."""

    def __init__(self, path: str):
        self.buf = open(path, "rb").read()
        if self.buf[:8] != b"\x89HDF\r\n\x1a\n":
            raise ValueError("not an HDF5 file")
        root_ste = 56
        (self.root_addr,) = struct.unpack_from("<Q", self.buf, root_ste + 8)

    # -- low-level parsers -------------------------------------------------
    def _messages(self, addr: int):
        ver, _, nmsg, _refs, size = struct.unpack_from(
            "<BBHII", self.buf, addr
        )
        assert ver == 1, "only v1 object headers supported"
        pos, end = addr + 16, addr + 16 + size
        out = []
        for _ in range(nmsg):
            mtype, msize, _flags = struct.unpack_from("<HHB", self.buf, pos)
            out.append((mtype, self.buf[pos + 8:pos + 8 + msize]))
            pos += 8 + msize
            assert pos <= end
        return out

    def _parse_dtype(self, b: bytes):
        cls_ver, b0 = b[0], b[1]
        cls, size = cls_ver & 0x0F, struct.unpack_from("<I", b, 4)[0]
        if cls == 0:
            return np.dtype(f"<i{size}")
        if cls == 1:
            return np.dtype(f"<f{size}")
        if cls == 3:
            return np.dtype(f"S{size}")
        raise ValueError(f"datatype class {cls}")

    def _parse_shape(self, b: bytes):
        rank = b[1]
        return tuple(
            struct.unpack_from("<Q", b, 8 + 8 * i)[0] for i in range(rank)
        )

    def _parse_attr(self, b: bytes):
        _ver, _res, nsz, dtsz, dssz = struct.unpack_from("<BBHHH", b, 0)
        pos = 8
        name = b[pos:pos + nsz].split(b"\x00")[0].decode()
        pos += _pad8(nsz)
        dt = self._parse_dtype(b[pos:pos + dtsz])
        pos += _pad8(dtsz) + _pad8(dssz)  # scalar dataspace only
        raw = b[pos:]
        if dt.kind == "S":
            return name, raw[: dt.itemsize].split(b"\x00")[0].decode()
        return name, np.frombuffer(raw[: dt.itemsize], dtype=dt)[0].item()

    def _links(self, group_addr: int) -> dict[str, int]:
        msgs = dict()
        st = [m for t, m in self._messages(group_addr) if t == 0x0011]
        if not st:
            return {}
        btree, heap = struct.unpack_from("<QQ", st[0], 0)
        assert self.buf[heap:heap + 4] == b"HEAP"
        (heap_data,) = struct.unpack_from("<Q", self.buf, heap + 24)
        assert self.buf[btree:btree + 4] == b"TREE"
        (nchild,) = struct.unpack_from("<H", self.buf, btree + 6)
        out = {}
        for c in range(nchild):
            (snod,) = struct.unpack_from(
                "<Q", self.buf, btree + 24 + 8 + c * 16
            )
            assert self.buf[snod:snod + 4] == b"SNOD"
            (n,) = struct.unpack_from("<H", self.buf, snod + 6)
            for i in range(n):
                off, ohdr = struct.unpack_from(
                    "<QQ", self.buf, snod + 8 + i * 40
                )
                name_end = self.buf.index(b"\x00", heap_data + off)
                out[self.buf[heap_data + off:name_end].decode()] = ohdr
        return out

    def _resolve(self, path: str) -> int:
        addr = self.root_addr
        for part in [p for p in path.strip("/").split("/") if p]:
            links = self._links(addr)
            if part not in links:
                raise KeyError(path)
            addr = links[part]
        return addr

    # -- public API --------------------------------------------------------
    def list_links(self, path: str = "/") -> list[str]:
        return sorted(self._links(self._resolve(path)))

    def read_dataset(self, path: str) -> np.ndarray:
        msgs = dict()
        dt = shape = layout = None
        for t, m in self._messages(self._resolve(path)):
            if t == 0x0001:
                shape = self._parse_shape(m)
            elif t == 0x0003:
                dt = self._parse_dtype(m)
            elif t == 0x0008:
                version, lclass = m[0], m[1]
                if version != 3 or lclass != 1:
                    # real libhdf5 pipelines typically write CHUNKED
                    # (class 2, often compressed) datasets; this reader
                    # covers only the contiguous classic slice the
                    # sibling writer emits.  Name the dataset and the
                    # remedy instead of failing deep in the parser.
                    kind = {0: "compact", 1: "contiguous", 2: "chunked"}.get(
                        lclass, f"class {lclass}"
                    )
                    raise NotImplementedError(
                        f"dataset {path!r} uses a {kind} data layout "
                        f"(message version {version}); MiniH5Reader only "
                        "parses contiguous v3 layouts as written by "
                        "MiniH5Writer — install h5py to read files from "
                        "libhdf5 pipelines (chunked/compressed layouts)"
                    )
                layout = struct.unpack_from("<QQ", m, 2)
        assert dt is not None and shape is not None and layout is not None
        addr, nbytes = layout
        arr = np.frombuffer(self.buf[addr:addr + nbytes], dtype=dt)
        return arr.reshape(shape)

    def read_attrs(self, path: str) -> dict:
        return dict(
            self._parse_attr(m)
            for t, m in self._messages(self._resolve(path))
            if t == 0x000C
        )
