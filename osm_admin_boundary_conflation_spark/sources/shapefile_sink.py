"""S9: ESRI Shapefile sink (inputcsv2shp.py — debug/visualization only).

The reference writes the cadastre polygons + level6-9 attributes through
fiona; neither fiona nor pyshp ships in this environment, so this is a
minimal from-scratch writer for the POLYGON subset the cadastre schema
uses: .shp (geometry), .shx (index), .dbf (dBase III string attributes),
.prj (EPSG:4326 WKT). Spec: ESRI Shapefile Technical Description
(July 1998) — outer rings clockwise, holes counter-clockwise, lengths in
16-bit words, mixed big/little endianness exactly as published.

Like the reference, this is a DRIVER-SIDE debug sink (fiona is not
distributed either): callers pass bounded collected rows. The
production outputs remain parquet/checkpoint tables.
"""

from __future__ import annotations

import struct

from ..functions import geometry as G

FIELDS = [
    "level9id",
    "level9name",
    "level8id",
    "level8name",
    "level7id",
    "level7name",
    "level6id",
    "level6name",
]
_FIELD_LEN = 80

WGS84_PRJ = (
    'GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",SPHEROID["WGS_1984",'
    '6378137.0,298.257223563]],PRIMEM["Greenwich",0.0],'
    'UNIT["Degree",0.0174532925199433]]'
)


def _ring_cw(ring):
    """Shapefile outer rings are clockwise (negative shoelace area)."""
    return ring if G.ring_area_signed(ring) <= 0 else ring[::-1]


def _ring_ccw(ring):
    return ring if G.ring_area_signed(ring) >= 0 else ring[::-1]


def _polygon_record(mp) -> bytes:
    """Multipolygon structure → one shapefile POLYGON record content.
    A geometry with no rings (e.g. merge_lines_to_rings dropped every
    unclosable chain) becomes a spec-correct Null Shape (type 0) record
    instead of crashing on min()/max() of empty lists."""
    rings = []
    for poly in mp:
        if not poly:
            continue
        rings.append(_ring_cw(poly[0]))
        rings.extend(_ring_ccw(h) for h in poly[1:])
    if not rings:
        return struct.pack("<i", 0)  # Null Shape
    xs = [float(x) for r in rings for x, _ in r]
    ys = [float(y) for r in rings for _, y in r]
    n_points = sum(len(r) for r in rings)
    content = struct.pack("<i", 5)  # shape type POLYGON
    content += struct.pack("<4d", min(xs), min(ys), max(xs), max(ys))
    content += struct.pack("<2i", len(rings), n_points)
    offset = 0
    for r in rings:
        content += struct.pack("<i", offset)
        offset += len(r)
    for r in rings:
        for x, y in r:
            content += struct.pack("<2d", float(x), float(y))
    return content


def _main_header(total_len_bytes: int, bbox) -> bytes:
    h = struct.pack(">i", 9994) + b"\x00" * 20
    h += struct.pack(">i", total_len_bytes // 2)
    h += struct.pack("<2i", 1000, 5)
    h += struct.pack("<4d", *bbox)
    h += struct.pack("<4d", 0.0, 0.0, 0.0, 0.0)  # z/m ranges
    return h


def _dbf_bytes(records: list[dict]) -> bytes:
    rec_size = 1 + _FIELD_LEN * len(FIELDS)
    header_size = 32 + 32 * len(FIELDS) + 1
    out = struct.pack(
        "<B3BIHH20x", 0x03, 24, 1, 1, len(records), header_size, rec_size
    )
    for name in FIELDS:
        out += struct.pack(
            "<11sc4xBB14x", name.encode("ascii"), b"C", _FIELD_LEN, 0
        )
    out += b"\x0d"
    for rec in records:
        row = b" "
        for name in FIELDS:
            v = rec.get(name)
            row += _truncate_utf8(("" if v is None else str(v)).encode("utf-8")).ljust(
                _FIELD_LEN, b" "
            )
        out += row
    return out + b"\x1a"


def _truncate_utf8(raw: bytes, limit: int = _FIELD_LEN) -> bytes:
    """Byte-truncate on a CHARACTER boundary: a naive [:limit] can split
    a multibyte UTF-8 sequence and make the reader's decode throw.
    Backtrack past any trailing continuation bytes (0b10xxxxxx)."""
    if len(raw) <= limit:
        return raw
    cut = limit
    while cut > 0 and (raw[cut] & 0xC0) == 0x80:
        cut -= 1
    return raw[:cut]


def write_shapefile(rows: list[dict], base_path: str) -> dict:
    """rows: dicts with 'wkt' + the 8 cadastre property fields.
    Writes base_path + .shp/.shx/.dbf/.prj; returns summary stats."""
    shapes = [G.parse_wkt(r["wkt"]) for r in rows]
    recs = [_polygon_record(mp) for mp in shapes]

    all_pts = [
        (float(x), float(y))
        for mp in shapes
        for poly in mp
        for ring in poly
        for x, y in ring
    ]
    if all_pts:
        bbox = (
            min(p[0] for p in all_pts),
            min(p[1] for p in all_pts),
            max(p[0] for p in all_pts),
            max(p[1] for p in all_pts),
        )
    else:  # every geometry degenerated to a Null Shape
        bbox = (0.0, 0.0, 0.0, 0.0)

    shp = b""
    shx = b""
    offset_words = 50  # header = 100 bytes
    for i, content in enumerate(recs):
        shp += struct.pack(">2i", i + 1, len(content) // 2) + content
        shx += struct.pack(">2i", offset_words, len(content) // 2)
        offset_words += 4 + len(content) // 2
    with open(base_path + ".shp", "wb") as f:
        f.write(_main_header(100 + len(shp), bbox) + shp)
    with open(base_path + ".shx", "wb") as f:
        f.write(_main_header(100 + len(shx), bbox) + shx)
    with open(base_path + ".dbf", "wb") as f:
        f.write(_dbf_bytes(rows))
    with open(base_path + ".prj", "w") as f:
        f.write(WGS84_PRJ)
    return {"n_records": len(recs), "bbox": bbox, "base_path": base_path}


# --- minimal reader (tests / round-trip verification) ----------------------


def read_shapefile(base_path: str) -> list[dict]:
    """Parse back .shp + .dbf (subset written above)."""
    with open(base_path + ".shp", "rb") as f:
        data = f.read()
    assert struct.unpack(">i", data[:4])[0] == 9994
    assert struct.unpack("<i", data[32:36])[0] == 5
    out = []
    pos = 100
    while pos < len(data):
        _recno, clen = struct.unpack(">2i", data[pos : pos + 8])
        body = data[pos + 8 : pos + 8 + clen * 2]
        pos += 8 + clen * 2
        shape_type = struct.unpack("<i", body[:4])[0]
        if shape_type == 0:  # Null Shape (empty geometry)
            out.append({"rings": []})
            continue
        assert shape_type == 5
        n_parts, n_points = struct.unpack("<2i", body[36:44])
        parts = list(struct.unpack(f"<{n_parts}i", body[44 : 44 + 4 * n_parts]))
        pts_off = 44 + 4 * n_parts
        pts = [
            struct.unpack("<2d", body[pts_off + 16 * i : pts_off + 16 * (i + 1)])
            for i in range(n_points)
        ]
        bounds = parts + [n_points]
        rings = [pts[bounds[i] : bounds[i + 1]] for i in range(n_parts)]
        out.append({"rings": rings})

    with open(base_path + ".dbf", "rb") as f:
        dbf = f.read()
    n_rec, hdr, rec_size = struct.unpack("<IHH", dbf[4:12])
    for i in range(n_rec):
        row = dbf[hdr + i * rec_size : hdr + (i + 1) * rec_size][1:]
        props = {}
        for j, name in enumerate(FIELDS):
            raw = row[j * _FIELD_LEN : (j + 1) * _FIELD_LEN].rstrip(b" ")
            props[name] = raw.decode("utf-8") if raw else None
        out[i]["properties"] = props
    return out
