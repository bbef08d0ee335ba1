"""PointCloud2 codec — standalone reimplementation of the vendored BSD ROS
helpers (reference point_cloud2.py:1-209; unused by the main path but part of
the component inventory, SURVEY.md §2.1 #16).

Works without ROS: messages are duck-typed (any object or SimpleNamespace with
fields/width/height/point_step/row_step/data/is_bigendian), and a minimal
`PointField` is provided for ROS-free use.
"""

from __future__ import annotations

import math
import struct
from types import SimpleNamespace
from typing import Iterable, List, NamedTuple, Optional, Sequence


class PointField(NamedTuple):
    name: str
    offset: int
    datatype: int
    count: int


# sensor_msgs/PointField datatype constants
INT8, UINT8, INT16, UINT16, INT32, UINT32, FLOAT32, FLOAT64 = range(1, 9)

_DATATYPES = {
    INT8: ("b", 1), UINT8: ("B", 1), INT16: ("h", 2), UINT16: ("H", 2),
    INT32: ("i", 4), UINT32: ("I", 4), FLOAT32: ("f", 4), FLOAT64: ("d", 8),
}


def _get_struct_fmt(is_bigendian: bool, fields: Sequence,
                    field_names: Optional[Sequence[str]] = None) -> str:
    fmt = ">" if is_bigendian else "<"
    offset = 0
    for field in sorted(fields, key=lambda f: f.offset):
        if field_names is not None and field.name not in field_names:
            continue
        if offset < field.offset:
            fmt += "x" * (field.offset - offset)
            offset = field.offset
        dt_fmt, dt_len = _DATATYPES[field.datatype]
        fmt += field.count * dt_fmt
        offset += field.count * dt_len
    return fmt


def read_points(cloud, field_names: Optional[Sequence[str]] = None,
                skip_nans: bool = False,
                uvs: Iterable = ()) -> Iterable[tuple]:
    """Yield point tuples from a PointCloud2-like message."""
    fmt = _get_struct_fmt(cloud.is_bigendian, cloud.fields, field_names)
    width, height = cloud.width, cloud.height
    point_step, row_step = cloud.point_step, cloud.row_step
    data = cloud.data
    unpack_from = struct.Struct(fmt).unpack_from

    def gen():
        if uvs:
            for u, v in uvs:
                yield unpack_from(data, row_step * v + point_step * u)
        else:
            for v in range(height):
                offset = row_step * v
                for _ in range(width):
                    yield unpack_from(data, offset)
                    offset += point_step

    if skip_nans:
        for p in gen():
            if not any(isinstance(x, float) and math.isnan(x) for x in p):
                yield p
    else:
        yield from gen()


def read_points_list(cloud, field_names: Optional[Sequence[str]] = None,
                     skip_nans: bool = False, uvs: Iterable = ()) -> List[tuple]:
    return list(read_points(cloud, field_names, skip_nans, uvs))


def create_cloud(header, fields: Sequence, points: Iterable[Sequence]):
    """Build a PointCloud2-like SimpleNamespace from point tuples."""
    fmt = _get_struct_fmt(False, fields)
    point_struct = struct.Struct(fmt)
    pts = list(points)
    buff = bytearray(point_struct.size * len(pts))
    offset = 0
    for p in pts:
        point_struct.pack_into(buff, offset, *p)
        offset += point_struct.size
    return SimpleNamespace(
        header=header, height=1, width=len(pts), is_dense=False,
        is_bigendian=False, fields=list(fields),
        point_step=point_struct.size,
        row_step=point_struct.size * len(pts),
        data=bytes(buff))


def create_cloud_xyz32(header, points: Iterable[Sequence]):
    fields = [PointField("x", 0, FLOAT32, 1),
              PointField("y", 4, FLOAT32, 1),
              PointField("z", 8, FLOAT32, 1)]
    return create_cloud(header, fields, points)
