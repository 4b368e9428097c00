"""Minimal OSM .pbf WRITER for test fixtures — public format spec only
(protobuf wire format, fileformat.proto / osmformat.proto layouts, zlib
blobs).  Only what the S1 reader needs: DenseNodes, Ways, Relations, one
string table per block, delta+zigzag coding, default granularity."""

from __future__ import annotations

import struct
import zlib


def _vint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zz(v: int) -> int:
    return (v << 1) if v >= 0 else ((-v << 1) - 1)


def _tag(fno: int, wt: int) -> bytes:
    return _vint((fno << 3) | wt)


def _ld(fno: int, payload: bytes) -> bytes:
    return _tag(fno, 2) + _vint(len(payload)) + payload


def _vf(fno: int, v: int) -> bytes:
    return _tag(fno, 0) + _vint(v)


def _packed(fno: int, vals) -> bytes:
    return _ld(fno, b"".join(_vint(v) for v in vals))


class _Strings:
    def __init__(self):
        self.idx = {"": 0}
        self.lst = [""]

    def __call__(self, s: str) -> int:
        if s not in self.idx:
            self.idx[s] = len(self.lst)
            self.lst.append(s)
        return self.idx[s]


def _primitive_block(nodes=(), ways=(), relations=()) -> bytes:
    st = _Strings()
    groups = b""
    if nodes:
        ids, lats, lons, kv = [], [], [], []
        pid = plat = plon = 0
        for nid, lon, lat, tags in nodes:
            ids.append(_zz(nid - pid))
            pid = nid
            la, lo = round(lat * 1e7), round(lon * 1e7)
            lats.append(_zz(la - plat))
            plat = la
            lons.append(_zz(lo - plon))
            plon = lo
            for k, v in tags.items():
                kv.extend((st(k), st(v)))
            kv.append(0)
        dense = _packed(1, ids) + _packed(8, lats) + _packed(9, lons) + _packed(10, kv)
        groups += _ld(2, _ld(2, dense))
    members = b""
    for wid, refs, tags in ways:
        body = _vf(1, wid)
        if tags:
            body += _packed(2, [st(k) for k in tags]) + _packed(3, [st(v) for v in tags.values()])
        drefs, p = [], 0
        for r in refs:
            drefs.append(_zz(r - p))
            p = r
        members += _ld(3, body + _packed(8, drefs))
    tcode = {"node": 0, "way": 1, "relation": 2}
    for rid, mems, tags in relations:
        body = _vf(1, rid)
        if tags:
            body += _packed(2, [st(k) for k in tags]) + _packed(3, [st(v) for v in tags.values()])
        body += _packed(8, [st(role) for _, _, role in mems])
        dmids, p = [], 0
        for _, mid, _ in mems:
            dmids.append(_zz(mid - p))
            p = mid
        body += _packed(9, dmids) + _packed(10, [tcode[t] for t, _, _ in mems])
        members += _ld(4, body)
    if members:
        groups += _ld(2, members)
    strtab = b"".join(_ld(1, s.encode("utf-8")) for s in st.lst)
    return _ld(1, strtab) + groups


def _blob(btype: str, payload: bytes) -> bytes:
    comp = zlib.compress(payload)
    blob = _vf(2, len(payload)) + _ld(3, comp)
    hdr = _ld(1, btype.encode("utf-8")) + _vf(3, len(blob))
    return struct.pack(">I", len(hdr)) + hdr + blob


def write_pbf(path: str, nodes=(), ways=(), relations=()) -> str:
    """nodes: [(id, lon, lat, {tags})]; ways: [(id, [refs], {tags})];
    relations: [(id, [(mtype, mid, role)], {tags})].  Nodes go in one
    OSMData blob, ways+relations in a second — so the reader's blob-level
    parallelism is exercised by every fixture."""
    data = _blob("OSMHeader", _ld(4, b"OsmSchema-V0.6") + _ld(4, b"DenseNodes"))
    if nodes:
        data += _blob("OSMData", _primitive_block(nodes=nodes))
    if ways or relations:
        data += _blob("OSMData", _primitive_block(ways=ways, relations=relations))
    with open(path, "wb") as f:
        f.write(data)
    return path
