#!/usr/bin/env python3
"""Author an HDF5 known-answer fixture INDEPENDENTLY of sinks/hdf5_minimal.

Why this exists: the from-spec MiniH5Writer/MiniH5Reader pair
(sinks/hdf5_minimal.py) round-trips byte-identically, but a SYMMETRIC
bug — both sides agreeing on a wrong superblock/B-tree/heap detail —
would pass every round-trip test.  The image codecs closed the same
gap in r10 with externally-generated vectors (libwebp, JDK ImageIO);
for HDF5 this container has NO external producer (verified 2026-08-15:
no libhdf5*.so anywhere on the filesystem, h5py not importable, pip
index unreachable — `pip download h5py` fails with DNS errors), so
this is the strongest available substitute:

  a SECOND, structurally independent implementation of the write side,
  built from the public HDF5 File Format Specification
  (https://docs.hdfgroup.org/hdf5/develop/_f_m_t3.html) clause by
  clause, which deliberately makes the OPPOSITE choice everywhere the
  spec allows one, and emits layouts MiniH5Writer never produces:

  - allocation order: raw data first, object headers LAST (writer:
    headers first, data last);
  - local heap names in INSERTION order, not sorted; heap carries a
    real free block with a free-list head (writer: exact-size heap,
    free-list 1);
  - root group spread over TWO symbol-table nodes under one B-tree
    leaf (writer: always a single SNOD);
  - symbol-table entries use cache type 1 with B-tree/heap addresses
    in scratch space, libhdf5-style (writer: cache type 0);
  - object headers carry NIL (0x0000), fill-value v2 (0x0005) and
    object-modification-time (0x0012) messages the reader must skip,
    and put the datatype message BEFORE the dataspace (writer: fixed
    dataspace-first order, no extra messages);
  - dataspace v1 messages set flags bit 0 and append max-dimensions
    (writer: flags 0, no maxdims); one dataset is rank-0 scalar;
  - filter pipeline v1 messages carry the libhdf5 filter NAMES
    ("deflate\\0", "shuffle\\0", 8-byte padded) (writer: nameless);
    one dataset uses a filter pipeline v2 message;
  - one chunk is stored with a nonzero FILTER MASK (optional deflate
    skipped at write time, libhdf5 behavior when compression grows a
    chunk) (writer: mask always 0);
  - one chunked dataset has 65 chunks -> a real 2-LEVEL v1 B-tree with
    default indexed-storage k=32 node sizes (writer: k=_K nodes);
  - one contiguous dataset has the UNDEFINED address (libhdf5
    deferred allocation -> reads back as fill-value zeros);
  - superblock uses the libhdf5 default group leaf k=4 / internal
    k=16 (writer: _K for both).

Reference parity at stake: the reader under test here is what grades
the whole SONATA .h5 surface (reference
/root/reference/src/circuit/sonata_file.cpp:45-143) — see
sinks/sonata.py and sources/sonata_h5.py.

Output: tests/hdf5_fixtures.py (file bytes as hex + expected decoded
structure).  Deterministic — re-running reproduces the same bytes.
Run with --check-h5py to additionally validate the fixture with h5py
in an environment that has it (this container does not).
"""

from __future__ import annotations

import struct
import sys
import zlib

import numpy as np

UNDEF = 0xFFFFFFFFFFFFFFFF
LEAF_K = 4  # superblock "group leaf node k" (libhdf5 default)
INTERNAL_K = 16  # superblock "group internal node k" (libhdf5 default)
CHUNK_K = 32  # indexed-storage k: fixed default, absent from sb v0
GROUP_BTREE_NODE = 24 + (2 * INTERNAL_K + 1) * 8 + 2 * INTERNAL_K * 8
SNOD_SIZE = 8 + 2 * LEAF_K * 40
MTIME = 1755216000  # 2026-08-15, constant for determinism


def pad8(n: int) -> int:
    return (n + 7) & ~7


# --- message bodies (spec section IV.A.2), written fresh from the text ----


def dt_int(size: int) -> bytes:
    # class 0 fixed-point v1: LE (bit0=0), signed (bit3=1)
    return struct.pack("<BBBBIHH", 0x10, 0x08, 0, 0, size, 0, 8 * size)


def dt_float(size: int) -> bytes:
    # class 1 float v1: LE, implied-MSB mantissa normalization (0x20),
    # sign bit location in bitfield byte 1
    if size == 4:
        sign, eloc, esz, msz, bias = 31, 23, 8, 23, 127
    else:
        sign, eloc, esz, msz, bias = 63, 52, 11, 52, 1023
    return struct.pack(
        "<BBBBIHHBBBBI",
        0x11, 0x20, sign, 0, size, 0, 8 * size, eloc, esz, 0, msz, bias,
    )


def dt_str(size: int) -> bytes:
    # class 3 string v1: null-terminated, ASCII
    return struct.pack("<BBBBI", 0x13, 0, 0, 0, size)


def datatype(dt: np.dtype) -> bytes:
    if dt.kind == "i":
        return dt_int(dt.itemsize)
    if dt.kind == "f":
        return dt_float(dt.itemsize)
    return dt_str(dt.itemsize)


def dataspace(shape: tuple[int, ...]) -> bytes:
    # v1, flags bit 0 set: max dimensions present (equal to dims) —
    # the layout libhdf5 writes for fixed-shape datasets
    body = struct.pack("<BBB5x", 1, len(shape), 1 if shape else 0)
    for d in shape:
        body += struct.pack("<Q", d)
    for d in shape:  # max dims
        body += struct.pack("<Q", d)
    return body


def attr_body(name: str, value) -> bytes:
    # attribute message v1, scalar dataspace; each part padded to 8
    if isinstance(value, str):
        raw = value.encode()
        dt, data = dt_str(len(raw)), raw
    elif isinstance(value, float):
        dt, data = dt_float(8), np.float64(value).tobytes()
    elif isinstance(value, np.float32):
        dt, data = dt_float(4), value.tobytes()
    elif isinstance(value, np.int32):
        dt, data = dt_int(4), value.tobytes()
    else:
        dt, data = dt_int(8), np.int64(value).tobytes()
    ds = dataspace(())
    nm = name.encode() + b"\x00"

    def p8(b: bytes) -> bytes:
        return b + b"\x00" * (pad8(len(b)) - len(b))

    head = struct.pack("<BBHHH", 1, 0, len(nm), len(dt), len(ds))
    return head + p8(nm) + p8(dt) + p8(ds) + data


def message(mtype: int, body: bytes) -> bytes:
    body += b"\x00" * (pad8(len(body)) - len(body))
    return struct.pack("<HHB3x", mtype, len(body), 0) + body


def object_header(messages: list[bytes]) -> bytes:
    blob = b"".join(messages)
    return (
        struct.pack("<BBHII4x", 1, 0, len(messages), 1, len(blob)) + blob
    )


FILL_V2_UNDEFINED = struct.pack("<BBBB", 2, 2, 0, 0)
MTIME_MSG = struct.pack("<B3xI", 1, MTIME)
NIL_MSG = b"\x00" * 8  # 8-byte nil body


def filters_v1(entries) -> bytes:
    """v1 pipeline WITH libhdf5 filter names.  entries:
    [(fid, name, flags, [client values])]."""
    body = struct.pack("<BB6x", 1, len(entries))
    for fid, name, flags, cvals in entries:
        nm = name.encode() + b"\x00"
        nm += b"\x00" * (pad8(len(nm)) - len(nm))
        body += struct.pack("<HHHH", fid, len(nm), flags, len(cvals))
        body += nm + b"".join(struct.pack("<I", v) for v in cvals)
        if len(cvals) % 2:
            body += b"\x00" * 4
    return body


def filters_v2(entries) -> bytes:
    """v2 pipeline: reserved-id filters carry no name, no padding."""
    body = struct.pack("<BB", 2, len(entries))
    for fid, flags, cvals in entries:
        body += struct.pack("<HHHH", fid, 0, flags, len(cvals))
        body += b"".join(struct.pack("<I", v) for v in cvals)
    return body


def layout_contig(addr: int, nbytes: int) -> bytes:
    return struct.pack("<BBQQ", 3, 1, addr, nbytes)


def layout_chunked(btree: int, chunks: tuple[int, ...], isz: int) -> bytes:
    dims = tuple(chunks) + (isz,)
    return (
        struct.pack("<BBB", 3, 2, len(dims))
        + struct.pack("<Q", btree)
        + struct.pack(f"<{len(dims)}I", *dims)
    )


# --- file assembly ---------------------------------------------------------


class Alloc:
    """Append-only address space starting after the 96-byte superblock."""

    def __init__(self):
        self.pos = 96
        self.patches: list[tuple[int, bytes]] = []

    def take(self, n: int, align: int = 8) -> int:
        self.pos = (self.pos + align - 1) & ~(align - 1)
        a = self.pos
        self.pos += n
        return a

    def put(self, addr: int, blob: bytes) -> None:
        self.patches.append((addr, blob))

    def render(self) -> bytes:
        buf = bytearray(self.pos)
        for addr, blob in self.patches:
            buf[addr:addr + len(blob)] = blob
        return bytes(buf)


def chunk_key(size: int, mask: int, offs, ndp1: int) -> bytes:
    o = tuple(offs) + (0,) * (ndp1 - len(offs))
    return struct.pack("<II", size, mask) + struct.pack(f"<{ndp1}Q", *o)


def build() -> tuple[bytes, dict]:
    al = Alloc()
    rng_vals = {}

    # ---- dataset payloads (ground truth) --------------------------------
    contig_i4 = (np.arange(15, dtype=np.int32) * 3 - 7).reshape(5, 3)
    vec_f4 = np.array([0.5, -1.25, 3.75, 100.0, -0.0078125, 7.0, 2.5],
                      dtype=np.float32)
    scalar_f8 = np.float64(3.141592653589793)
    chunked_f8 = np.array([i * 0.375 - 1.5 for i in range(10)],
                          dtype=np.float64)
    chunked_i2 = np.array([-3, 700, 31000, -31000, 42, 0], dtype=np.int16)
    big_i8 = (np.arange(130, dtype=np.int64) ** 3 - 500)
    strings = np.array([b"alpha", b"beta", b"gamma!", b"d"], dtype="S8")
    grid_i4 = np.arange(20, dtype=np.int32).reshape(5, 4) * 11 - 60

    # ---- 1. raw data blocks FIRST (inverse of MiniH5Writer) -------------
    a_contig_i4 = al.take(contig_i4.nbytes)
    al.put(a_contig_i4, contig_i4.tobytes())
    a_vec_f4 = al.take(vec_f4.nbytes)
    al.put(a_vec_f4, vec_f4.tobytes())
    a_scalar = al.take(8)
    al.put(a_scalar, scalar_f8.tobytes())

    # chunked_f8: chunks of 4 -> 3 chunks (last partial, stored FULL
    # chunk with trailing garbage zeros, libhdf5-style), shuffle+deflate
    f8_chunks = []
    for c0 in (0, 4, 8):
        full = np.zeros(4, dtype=np.float64)
        part = chunked_f8[c0:c0 + 4]
        full[: len(part)] = part
        raw = full.tobytes()
        shuf = np.frombuffer(raw, np.uint8).reshape(4, 8).T.tobytes()
        blob = zlib.compress(shuf, 6)
        addr = al.take(len(blob))
        al.put(addr, blob)
        f8_chunks.append(((c0,), addr, len(blob), 0))

    # chunked_i2: chunks of 3 -> 2 chunks; the SECOND chunk stored with
    # the optional deflate SKIPPED (filter mask bit 1): shuffled only
    i2_chunks = []
    for i, c0 in enumerate((0, 3)):
        raw = chunked_i2[c0:c0 + 3].tobytes()
        shuf = np.frombuffer(raw, np.uint8).reshape(3, 2).T.tobytes()
        if i == 0:
            blob, mask = zlib.compress(shuf, 6), 0
        else:
            blob, mask = shuf, 0b10  # deflate (index 1) skipped
        addr = al.take(len(blob))
        al.put(addr, blob)
        i2_chunks.append(((c0,), addr, len(blob), mask))

    # big_i8: 130 elements, chunks of 2 -> 65 chunks, no filters
    big_chunks = []
    for c0 in range(0, 130, 2):
        blob = big_i8[c0:c0 + 2].tobytes()
        addr = al.take(len(blob))
        al.put(addr, blob)
        big_chunks.append(((c0,), addr, len(blob), 0))

    a_strings = al.take(strings.nbytes)
    al.put(a_strings, strings.tobytes())

    # grid_i4: 5x4, chunks (2,3) -> 3x2 grid, edge chunks partial both
    # dims; deflate only, via a v2 pipeline message
    grid_chunks = []
    for r0 in (0, 2, 4):
        for c0 in (0, 3):
            full = np.zeros((2, 3), dtype=np.int32)
            part = grid_i4[r0:r0 + 2, c0:c0 + 3]
            full[: part.shape[0], : part.shape[1]] = part
            blob = zlib.compress(full.tobytes(), 9)
            addr = al.take(len(blob))
            al.put(addr, blob)
            grid_chunks.append(((r0, c0), addr, len(blob), 0))

    # ---- 2. chunk B-trees ------------------------------------------------
    def chunk_btree(chunks, shape, cshape) -> int:
        """One or two levels of v1 type-1 nodes at default k=32 node
        size; returns the root node address."""
        ndp1 = len(cshape) + 1
        ksz = 8 + 8 * ndp1
        node_size = 24 + (2 * CHUNK_K + 1) * ksz + 2 * CHUNK_K * 8
        grid_end = tuple(-(-s // c) * c for s, c in zip(shape, cshape))
        end_key = chunk_key(0, 0, grid_end, ndp1)
        keys = [chunk_key(sz, m, off, ndp1) for off, _, sz, m in chunks]
        children = [addr for _, addr, _, _ in chunks]

        def emit(level, keys, children, uplim) -> list[tuple[int, bytes]]:
            """Split into nodes of <= 2k entries; returns
            [(first key, node addr)]."""
            cap = 2 * CHUNK_K
            groups = []
            i = 0
            while i < len(children):
                # libhdf5 splits an overflowing node roughly in half:
                # emulate with a 33/32 split at 65 entries
                n = min(cap, len(children) - i)
                if len(children) - i == 65:
                    n = 33
                groups.append((i, i + n))
                i += n
            addrs = [al.take(node_size) for _ in groups]
            out = []
            for gi, (b, e) in enumerate(groups):
                left = addrs[gi - 1] if gi > 0 else UNDEF
                right = addrs[gi + 1] if gi + 1 < len(addrs) else UNDEF
                node = b"TREE" + struct.pack("<BBH", 1, level, e - b)
                node += struct.pack("<QQ", left, right)
                for j in range(b, e):
                    node += keys[j] + struct.pack("<Q", children[j])
                node += keys[e] if e < len(children) else uplim
                node += b"\x00" * (node_size - len(node))
                al.put(addrs[gi], node)
                out.append((keys[b], addrs[gi]))
            return out

        level = 0
        while True:
            nodes = emit(level, keys, children, end_key)
            if len(nodes) == 1:
                return nodes[0][1]
            keys = [k for k, _ in nodes]
            children = [a for _, a in nodes]
            level += 1

    bt_f8 = chunk_btree(f8_chunks, (10,), (4,))
    bt_i2 = chunk_btree(i2_chunks, (6,), (3,))
    bt_big = chunk_btree(big_chunks, (130,), (2,))
    bt_grid = chunk_btree(grid_chunks, (5, 4), (2, 3))

    # ---- 3. object headers (datatype BEFORE dataspace; extra msgs) ------
    def ds_header(arr, layout_msg, pipeline=None, attrs=(), nil=False):
        msgs = [message(0x0003, datatype(arr.dtype))]
        msgs.append(message(0x0001, dataspace(arr.shape)))
        msgs.append(message(0x0005, FILL_V2_UNDEFINED))
        if pipeline is not None:
            msgs.append(message(0x000B, pipeline))
        msgs.append(message(0x0008, layout_msg))
        for k, v in attrs:
            msgs.append(message(0x000C, attr_body(k, v)))
        if nil:
            msgs.append(message(0x0000, NIL_MSG))
        msgs.append(message(0x0012, MTIME_MSG))
        blob = object_header(msgs)
        addr = al.take(len(blob))
        al.put(addr, blob)
        return addr

    h_contig_i4 = ds_header(
        contig_i4,
        layout_contig(a_contig_i4, contig_i4.nbytes),
        attrs=[("units", "counts"), ("scale", np.float32(0.25))],
        nil=True,
    )
    h_vec_f4 = ds_header(vec_f4, layout_contig(a_vec_f4, vec_f4.nbytes))
    h_scalar = ds_header(
        np.asarray(scalar_f8), layout_contig(a_scalar, 8)
    )
    h_chunked_f8 = ds_header(
        chunked_f8,
        layout_chunked(bt_f8, (4,), 8),
        pipeline=filters_v1(
            [(2, "shuffle", 0, []), (1, "deflate", 0, [6])]
        ),
    )
    h_chunked_i2 = ds_header(
        chunked_i2,
        layout_chunked(bt_i2, (3,), 2),
        pipeline=filters_v1(
            [(2, "shuffle", 0, []), (1, "deflate", 1, [6])]
        ),
        attrs=[("note", "mask chunk")],
    )
    h_big = ds_header(big_i8, layout_chunked(bt_big, (2,), 8))
    h_strings = ds_header(
        strings, layout_contig(a_strings, strings.nbytes)
    )
    empty_f4 = np.zeros((2, 2), dtype=np.float32)
    h_empty = ds_header(empty_f4, layout_contig(UNDEF, empty_f4.nbytes))
    h_grid = ds_header(
        grid_i4,
        layout_chunked(bt_grid, (2, 3), 4),
        pipeline=filters_v2([(1, 0, [9])]),
    )

    # ---- 4. groups: heap (insertion order, with a free block), two
    #         SNODs for the root, B-tree leaf, header -----------------------
    def group(children, attrs=(), n_snods=1):
        """children: [(link name, ohdr addr, is_group, (btree, heap))]
        in INSERTION order; SNOD entries are name-sorted per spec."""
        # local heap: offset 0 = 8 reserved NULs; names at insertion
        # order; trailing 16-byte free block on the free list
        heap_off, name_off = 8, {}
        for name, *_ in children:
            name_off[name] = heap_off
            heap_off += pad8(len(name) + 1)
        free_at = heap_off
        data_size = heap_off + 16
        a_heap_data = al.take(data_size)
        hd = bytearray(data_size)
        for name, *_ in children:
            o = name_off[name]
            hd[o:o + len(name) + 1] = name.encode() + b"\x00"
        hd[free_at:free_at + 16] = struct.pack("<QQ", 1, 16)
        al.put(a_heap_data, bytes(hd))
        a_heap = al.take(32)
        al.put(
            a_heap,
            b"HEAP"
            + struct.pack("<B3xQQQ", 0, data_size, free_at, a_heap_data),
        )

        ordered = sorted(children, key=lambda c: c[0])
        splits = []
        if n_snods == 1 or not ordered:
            splits = [ordered]
        else:
            half = (len(ordered) + 1) // 2
            splits = [ordered[:half], ordered[half:]]
        snod_addrs = []
        for part in splits:
            a = al.take(SNOD_SIZE)
            sn = b"SNOD" + struct.pack("<BBH", 1, 0, len(part))
            for name, ohdr, is_grp, gscratch in part:
                if is_grp:
                    sn += struct.pack(
                        "<QQII", name_off[name], ohdr, 1, 0
                    ) + struct.pack("<QQ", *gscratch)
                else:
                    sn += struct.pack(
                        "<QQII16x", name_off[name], ohdr, 0, 0
                    )
            sn += b"\x00" * (SNOD_SIZE - len(sn))
            al.put(a, sn)
            snod_addrs.append(a)

        a_btree = al.take(GROUP_BTREE_NODE)
        bt = b"TREE" + struct.pack("<BBH", 0, 0, len(snod_addrs))
        bt += struct.pack("<QQ", UNDEF, UNDEF)
        # keys: key[0]=0 (reserved empty name), separator = offset of
        # the first name in the following SNOD, final = last name
        bt += struct.pack("<Q", 0)
        for i, sa in enumerate(snod_addrs):
            bt += struct.pack("<Q", sa)
            if i + 1 < len(snod_addrs):
                bt += struct.pack("<Q", name_off[splits[i + 1][0][0]])
            else:
                bt += struct.pack(
                    "<Q", name_off[ordered[-1][0]] if ordered else 0
                )
        bt += b"\x00" * (GROUP_BTREE_NODE - len(bt))
        al.put(a_btree, bt)

        msgs = [message(0x0011, struct.pack("<QQ", a_btree, a_heap))]
        for k, v in attrs:
            msgs.append(message(0x000C, attr_body(k, v)))
        blob = object_header(msgs)
        a_hdr = al.take(len(blob))
        al.put(a_hdr, blob)
        return a_hdr, (a_btree, a_heap)

    # ---- SONATA-shaped tree: grades the PRODUCTION read path
    #      (sources/sonata_h5.read_sonata_edges) against these
    #      independently-authored bytes, not just MiniH5Reader ---------
    src_ids = np.array([3, 1, 4, 1, 5, 9, 2], dtype=np.int64)
    tgt_ids = np.array([2, 7, 1, 8, 2, 8, 1], dtype=np.int64)
    etype = np.zeros(7, dtype=np.int64)
    weight = np.array([0.5, -1.25, 3.0, 0.0625, 2.5, -7.75, 1.0],
                      dtype=np.float64)
    delay = np.array([1.5, 2.0, 0.25, 4.0, 0.5, 8.0, 1.0],
                     dtype=np.float32)
    # weight: chunked + shuffle + deflate with a partial edge chunk
    w_chunks = []
    for c0 in (0, 4):
        full = np.zeros(4, dtype=np.float64)
        part = weight[c0 : c0 + 4]
        full[: len(part)] = part
        raw = full.tobytes()
        shuf = np.frombuffer(raw, np.uint8).reshape(4, 8).T.tobytes()
        blob = zlib.compress(shuf, 6)
        addr = al.take(len(blob))
        al.put(addr, blob)
        w_chunks.append(((c0,), addr, len(blob), 0))
    bt_w = chunk_btree(w_chunks, (7,), (4,))
    a_src = al.take(src_ids.nbytes)
    al.put(a_src, src_ids.tobytes())
    a_tgt = al.take(tgt_ids.nbytes)
    al.put(a_tgt, tgt_ids.tobytes())
    a_et = al.take(etype.nbytes)
    al.put(a_et, etype.tobytes())
    a_dl = al.take(delay.nbytes)
    al.put(a_dl, delay.tobytes())
    h_src = ds_header(src_ids, layout_contig(a_src, src_ids.nbytes))
    h_tgt = ds_header(tgt_ids, layout_contig(a_tgt, tgt_ids.nbytes))
    h_et = ds_header(etype, layout_contig(a_et, etype.nbytes))
    h_wt = ds_header(
        weight,
        layout_chunked(bt_w, (4,), 8),
        pipeline=filters_v1(
            [(2, "shuffle", 0, []), (1, "deflate", 0, [6])]
        ),
    )
    h_dl = ds_header(delay, layout_contig(a_dl, delay.nbytes))
    h_zero, sc_zero = group(
        [("weight", h_wt, False, None), ("delay", h_dl, False, None)]
    )
    h_pop, sc_pop = group(
        [
            ("target_node_id", h_tgt, False, None),
            ("source_node_id", h_src, False, None),
            ("edge_type_id", h_et, False, None),
            ("0", h_zero, True, sc_zero),
        ]
    )
    h_edges, sc_edges = group([("extpop", h_pop, True, sc_pop)])

    h_empty_grp, sc_empty = group([], attrs=[("kind", "empty")])
    h_deep2, sc_deep2 = group(
        # insertion order deliberately != sorted order
        [
            ("strings_s8", h_strings, False, None),
            ("empty_contig", h_empty, False, None),
            ("big_btree_i8", h_big, False, None),
            ("grid_i4", h_grid, False, None),
        ],
        attrs=[("seven77", 777), ("depth", np.int32(2))],
    )
    h_root, sc_root = group(
        [
            ("vec_f4", h_vec_f4, False, None),
            ("contig_i4", h_contig_i4, False, None),
            ("deep2", h_deep2, True, sc_deep2),
            ("scalar_f8", h_scalar, False, None),
            ("chunked_f8", h_chunked_f8, False, None),
            ("empty_grp", h_empty_grp, True, sc_empty),
            ("edges", h_edges, True, sc_edges),
            ("chunked_i2_mask", h_chunked_i2, False, None),
        ],
        attrs=[("title", "external fixture"), ("ratio", 0.625)],
        n_snods=2,
    )

    # ---- 5. superblock v0 with root STE (cache type 1 + scratch) --------
    eof = al.pos
    sb = b"\x89HDF\r\n\x1a\n"
    sb += struct.pack("<4B", 0, 0, 0, 0)
    sb += struct.pack("<BBBB", 0, 8, 8, 0)
    sb += struct.pack("<HH", LEAF_K, INTERNAL_K)
    sb += struct.pack("<I", 0)
    sb += struct.pack("<QQQQ", 0, UNDEF, eof, UNDEF)
    sb += struct.pack("<QQII", 0, h_root, 1, 0)
    sb += struct.pack("<QQ", *sc_root)
    assert len(sb) == 96
    al.put(0, sb)

    blob = al.render()

    expected = {
        "links": {
            "/": sorted(
                [
                    "vec_f4", "contig_i4", "deep2", "scalar_f8",
                    "chunked_f8", "empty_grp", "edges",
                    "chunked_i2_mask",
                ]
            ),
            "/deep2": sorted(
                ["strings_s8", "empty_contig", "big_btree_i8", "grid_i4"]
            ),
            "/empty_grp": [],
            "/edges": ["extpop"],
            "/edges/extpop": sorted(
                ["source_node_id", "target_node_id", "edge_type_id", "0"]
            ),
        },
        "attrs": {
            "/": {"title": "external fixture", "ratio": 0.625},
            "/deep2": {"seven77": 777, "depth": 2},
            "/empty_grp": {"kind": "empty"},
            "/contig_i4": {"units": "counts", "scale": 0.25},
            "/chunked_i2_mask": {"note": "mask chunk"},
        },
        "datasets": {
            "/contig_i4": ("<i4", contig_i4.tolist()),
            "/vec_f4": ("<f4", vec_f4.tolist()),
            "/scalar_f8": ("<f8", float(scalar_f8)),
            "/chunked_f8": ("<f8", chunked_f8.tolist()),
            "/chunked_i2_mask": ("<i2", chunked_i2.tolist()),
            "/deep2/big_btree_i8": ("<i8", big_i8.tolist()),
            "/deep2/strings_s8": (
                "|S8", [s.decode() for s in strings.tolist()]
            ),
            "/deep2/empty_contig": ("<f4", empty_f4.tolist()),
            "/deep2/grid_i4": ("<i4", grid_i4.tolist()),
        },
        "filters": {
            "/chunked_f8": [(2, 0), (1, 0)],
            "/chunked_i2_mask": [(2, 0), (1, 1)],
            "/deep2/big_btree_i8": [],
            "/deep2/grid_i4": [(1, 0)],
        },
        "mask_chunks": {"/chunked_i2_mask": [0, 0b10]},
        "n_chunks": {"/deep2/big_btree_i8": 65},
        # the SONATA-shaped edge population read by the production
        # source (column name -> dtype, values)
        "sonata": {
            "population": "extpop",
            "columns": {
                "source_node_id": ("<i8", src_ids.tolist()),
                "target_node_id": ("<i8", tgt_ids.tolist()),
                "edge_type_id": ("<i8", etype.tolist()),
                "weight": ("<f8", weight.tolist()),
                "delay": ("<f4", delay.tolist()),
            },
        },
    }
    return blob, expected


def main() -> None:
    blob, expected = build()
    hexstr = blob.hex()
    lines = [hexstr[i:i + 76] for i in range(0, len(hexstr), 76)]
    body = "\n".join(f'    "{ln}"' for ln in lines)
    out = f'''"""AUTO-GENERATED by scripts/make_hdf5_external_fixture.py — do not edit.

HDF5 known-answer fixture authored INDEPENDENTLY of
sinks/hdf5_minimal.py, byte-by-byte from the public HDF5 File Format
Specification, making the opposite choice everywhere the spec allows
one (see the generator docstring for the full list and for why a real
libhdf5-generated file is impossible in this container: no libhdf5,
no h5py, no network — verified 2026-08-15).  {len(blob)} bytes.
"""

FILE_HEX = (
{body}
)

EXPECTED = {expected!r}
'''
    with open("tests/hdf5_fixtures.py", "w") as f:
        f.write(out)
    print(f"wrote tests/hdf5_fixtures.py ({len(blob)} bytes of file)")

    if "--check-h5py" in sys.argv:
        import io

        import h5py  # noqa: F401

        with open("/tmp/_ext_fixture.h5", "wb") as f:
            f.write(blob)
        hf = h5py.File("/tmp/_ext_fixture.h5", "r")
        for path, (dt, vals) in expected["datasets"].items():
            arr = hf[path][()]
            ref = np.array(vals, dtype=dt)
            assert arr.shape == ref.shape and (arr == ref).all(), path
        print("h5py cross-validation: OK")


if __name__ == "__main__":
    main()
