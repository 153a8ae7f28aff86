"""Independent pure-python decoder of the touch binary format — the test
oracle for the Spark source (mirrors the reference's CI comparison
strategy: decode with a different implementation, compare after sorting
by synapse_id, `.ci/test_circuit*_touches.sh`).

Deliberately written with stdlib ``struct`` record-at-a-time (no numpy)
so it shares no code path with the engine's vectorized scan.
"""

from __future__ import annotations

import os
import struct

RECORD_FORMATS = {
    1: "<7i3f",            # 40 bytes
    2: "<7i3f2f3f3ffB3x",  # 80 bytes
    3: "<7i3f2f3f3ffB3x6f",  # 104 bytes
}


def decode_header(index_path: str, record_size_by_version={1: 40, 2: 80, 3: 104}):
    raw = open(index_path, "rb").read()
    arch, nn = struct.unpack("<dq", raw[:16])
    assert arch == 1.001
    version_string = raw[16:32].split(b"\x00")[0].decode()
    try:
        parts = [int(p) for p in version_string.split(".")]
        if parts[0] >= 6 or (len(parts) > 1 and parts[0] >= 5 and parts[1] >= 4):
            version = 3
        elif parts[0] >= 5 or (len(parts) > 1 and parts[0] >= 4 and parts[1] >= 99):
            version = 2
        else:
            version = 1
    except ValueError:
        version = 1
    rs = record_size_by_version[version]
    body = raw[32:]
    shifts = {}
    for i in range(len(body) // 16):
        nid, count, offset = struct.unpack_from("<iIq", body, i * 16)
        if nid in shifts and offset == 0 and count == 0:
            continue
        shifts[nid] = offset // rs
    return version, rs, shifts


def decode_file(data_path: str):
    """Yield dict rows with raw field names + file_pos + synapse_id."""
    base = os.path.basename(data_path)
    index_path = os.path.join(
        os.path.dirname(data_path), base.replace("Data", "", 1)
    )
    version, rs, shifts = decode_header(index_path)
    fmt = RECORD_FORMATS[version]
    data = open(data_path, "rb").read()
    assert len(data) % rs == 0
    for pos in range(len(data) // rs):
        vals = struct.unpack_from(fmt, data, pos * rs)
        row = {
            "pre_neuron_id": vals[0], "pre_section": vals[1], "pre_segment": vals[2],
            "post_neuron_id": vals[3], "post_section": vals[4], "post_segment": vals[5],
            "branch": vals[6],
            "distance_soma": vals[7], "pre_offset": vals[8], "post_offset": vals[9],
        }
        if version >= 2:
            row.update(
                pre_section_fraction=vals[10], post_section_fraction=vals[11],
                pre_position=list(vals[12:15]), post_position=list(vals[15:18]),
                spine_length=vals[18], branch_type=vals[19],
            )
        if version >= 3:
            row.update(
                pre_position_center=list(vals[20:23]),
                post_position_surface=list(vals[23:26]),
            )
        gid = row["pre_neuron_id"]
        index = pos - shifts.get(gid, 0)
        assert index < (1 << 24)
        row["file_pos"] = pos
        row["synapse_id"] = (gid << 24) + index
        yield row
