#!/usr/bin/env python3
"""Hand-write minimal-but-valid HDF5 files for the graft Hdf5 reader tests.

No HDF5 library exists in this environment, so the fixtures are produced
directly from the public HDF5 File Format Specification (v3,
https://docs.hdfgroup.org/hdf5/develop/_f_m_t3.html):

- mouse_v0.h5: superblock v0, v1 object headers, old-style groups
  (B-tree v1 + SNOD + local heap) — the layout h5py writes with
  libver='earliest'. Contains scalar f64 / i64, fixed and vlen strings,
  a contiguous f32 image, a chunked f32 image, and a gzip-compressed
  chunked f32 image, with units attributes in both fixed and vlen form.
- mouse_v2.h5: superblock v2, v2 object headers ("OHDR"), compact link
  messages — the layout h5py writes with libver='latest'.

Both mimic the MOUSE .nxs tree shape (entry1/instrument|sample|detector).
Only stdlib struct is used. Checksums are real Jenkins lookup3 so the v2
file is spec-valid, not merely self-consistent.
"""
import math
import struct
import sys
import zlib
from pathlib import Path

UNDEF = 0xFFFFFFFFFFFFFFFF


def pad8(n):
    return (n + 7) & ~7


# ---------------------------------------------------------------- lookup3 ---
def _rot(x, k):
    return ((x << k) | (x >> (32 - k))) & 0xFFFFFFFF


def _mix(a, b, c):
    a = (a - c) & 0xFFFFFFFF; a ^= _rot(c, 4);  c = (c + b) & 0xFFFFFFFF
    b = (b - a) & 0xFFFFFFFF; b ^= _rot(a, 6);  a = (a + c) & 0xFFFFFFFF
    c = (c - b) & 0xFFFFFFFF; c ^= _rot(b, 8);  b = (b + a) & 0xFFFFFFFF
    a = (a - c) & 0xFFFFFFFF; a ^= _rot(c, 16); c = (c + b) & 0xFFFFFFFF
    b = (b - a) & 0xFFFFFFFF; b ^= _rot(a, 19); a = (a + c) & 0xFFFFFFFF
    c = (c - b) & 0xFFFFFFFF; c ^= _rot(b, 4);  b = (b + a) & 0xFFFFFFFF
    return a, b, c


def _final(a, b, c):
    c ^= b; c = (c - _rot(b, 14)) & 0xFFFFFFFF
    a ^= c; a = (a - _rot(c, 11)) & 0xFFFFFFFF
    b ^= a; b = (b - _rot(a, 25)) & 0xFFFFFFFF
    c ^= b; c = (c - _rot(b, 16)) & 0xFFFFFFFF
    a ^= c; a = (a - _rot(c, 4)) & 0xFFFFFFFF
    b ^= a; b = (b - _rot(a, 14)) & 0xFFFFFFFF
    c ^= b; c = (c - _rot(b, 24)) & 0xFFFFFFFF
    return c


def lookup3(data, initval=0):
    """Bob Jenkins' hashlittle over bytes — HDF5's metadata checksum."""
    length = len(data)
    a = b = c = (0xDEADBEEF + length + initval) & 0xFFFFFFFF
    i = 0
    while length > 12:
        a = (a + int.from_bytes(data[i:i + 4], 'little')) & 0xFFFFFFFF
        b = (b + int.from_bytes(data[i + 4:i + 8], 'little')) & 0xFFFFFFFF
        c = (c + int.from_bytes(data[i + 8:i + 12], 'little')) & 0xFFFFFFFF
        a, b, c = _mix(a, b, c)
        i += 12
        length -= 12
    tail = data[i:] + b"\x00" * (12 - length)
    if length == 0:
        return c
    a = (a + int.from_bytes(tail[0:4], 'little')) & 0xFFFFFFFF
    b = (b + int.from_bytes(tail[4:8], 'little')) & 0xFFFFFFFF
    c = (c + int.from_bytes(tail[8:12], 'little')) & 0xFFFFFFFF
    return _final(a, b, c)


# ------------------------------------------------------------------ buffer --
class FileBuf:
    def __init__(self):
        self.buf = bytearray()

    def alloc(self, size, align=8):
        while len(self.buf) % align:
            self.buf.append(0)
        addr = len(self.buf)
        self.buf += bytes(size)
        return addr

    def write(self, addr, data):
        self.buf[addr:addr + len(data)] = data

    def append(self, data, align=8):
        addr = self.alloc(len(data), align)
        self.write(addr, data)
        return addr


# ------------------------------------------------------------- type/space ---
def dt_f64():
    # class 1 float, v1; LE, IEEE double
    return struct.pack('<B3sI2H4BI', 0x11, bytes([0x20, 0x3F, 0x00]), 8,
                       0, 64, 52, 11, 0, 52, 1023)


def dt_f32():
    return struct.pack('<B3sI2H4BI', 0x11, bytes([0x20, 0x1F, 0x00]), 4,
                       0, 32, 23, 8, 0, 23, 127)


def dt_f16():
    # class 1 float, v1; LE, IEEE half — an UNSUPPORTED width: datasets
    # fail loudly, attributes must SKIP (never abort the file read)
    return struct.pack('<B3sI2H4BI', 0x11, bytes([0x20, 0x0F, 0x00]), 2,
                       0, 16, 10, 5, 0, 10, 15)


def dt_i64():
    # class 0 fixed-point, signed LE
    return struct.pack('<B3sI2H', 0x10, bytes([0x08, 0x00, 0x00]), 8, 0, 64)


def dt_array(base, base_size, dims, version=3):
    """Class 10 array datatype: dimensionality, [v2: 3 reserved], u32 dims,
    [v2: u32 permutation per dim], then the full base-type encoding."""
    total = base_size
    for d in dims:
        total *= d
    props = struct.pack('<B', len(dims))
    if version == 2:
        props += bytes(3)
    props += b''.join(struct.pack('<I', d) for d in dims)
    if version == 2:
        props += b''.join(struct.pack('<I', 0) for _ in dims)
    return struct.pack('<B3sI', (version << 4) | 10, bytes(3), total) + \
        props + base


def dt_u32():
    # class 0 fixed-point, UNSIGNED LE (Eiger pixel data type)
    return struct.pack('<B3sI2H', 0x10, bytes([0x00, 0x00, 0x00]), 4, 0, 32)


def dt_u64():
    return struct.pack('<B3sI2H', 0x10, bytes([0x00, 0x00, 0x00]), 8, 0, 64)


def dt_str(size):
    # class 3 string, null-terminated, ASCII
    return struct.pack('<B3sI', 0x13, bytes([0x00, 0x00, 0x00]), size)


def dt_vlen_str():
    # class 9 vlen, type=string, ASCII; base type = 1-byte string
    return struct.pack('<B3sI', 0x19, bytes([0x01, 0x00, 0x00]), 16) + dt_str(1)


def dt_vlen_seq():
    # class 9 vlen SEQUENCE (bits[0] type 0, not string) — the reader
    # supports vlen STRINGS only, so parsing this datatype throws
    return struct.pack('<B3sI', 0x19, bytes([0x00, 0x00, 0x00]), 16) + dt_f32()


def dt_objref(rtype=0, size=8):
    # class 7 reference, v1; bits[0] low nibble = reference type
    # (0 = H5R_OBJECT: an 8-byte object-header address into this file)
    return struct.pack('<B3sI', 0x17, bytes([rtype, 0x00, 0x00]), size)


def space_scalar():
    return struct.pack('<4B4x', 1, 0, 0, 0)


def space_simple(dims):
    return struct.pack('<4B4x', 1, len(dims), 0, 0) + b''.join(
        struct.pack('<Q', d) for d in dims)


# ------------------------------------------------------------ global heap ---
class GlobalHeap:
    """One 4096-byte GCOL collection; returns (addr, index) per object."""

    def __init__(self, f: FileBuf):
        self.f = f
        self.addr = None
        self.objs = []

    def add(self, data: bytes):
        self.objs.append(data)
        return len(self.objs)  # 1-based object index

    def flush(self):
        size = 4096
        body = bytearray()
        body += b'GCOL' + struct.pack('<B3x', 1) + struct.pack('<Q', size)
        for i, data in enumerate(self.objs, start=1):
            body += struct.pack('<2HIQ', i, 1, 0, len(data))
            body += data + bytes(pad8(len(data)) - len(data))
        free = size - len(body)
        if free >= 16:  # object 0: free space, size includes its header
            body += struct.pack('<2HIQ', 0, 0, 0, free)
        body += bytes(size - len(body))
        self.addr = self.f.append(bytes(body))
        return self.addr


def vlen_ref(gheap_addr, index, length):
    return struct.pack('<IQI', length, gheap_addr, index)


# ---------------------------------------------------------------- messages --
def msg_v1(mtype, body):
    body = body + bytes(pad8(len(body)) - len(body))
    return struct.pack('<2HB3x', mtype, len(body), 0) + body


def object_header_v1(f: FileBuf, messages):
    block = b''.join(msg_v1(t, b) for t, b in messages)
    hdr = struct.pack('<BxHII4x', 1, len(messages), 1, len(block))
    return f.append(hdr + block)


def msg_v2(mtype, body):
    return struct.pack('<BHB', mtype, len(body), 0) + body


def object_header_v2(f: FileBuf, messages):
    block = b''.join(msg_v2(t, b) for t, b in messages)
    # flags: size-of-chunk0 stored as u32 (value 2)
    prefix = b'OHDR' + struct.pack('<BB', 2, 2) + struct.pack('<I', len(block))
    csum = lookup3(prefix + block)
    return f.append(prefix + block + struct.pack('<I', csum))


def attr_v1(name, dtype, dspace, data):
    nm = name.encode() + b'\x00'
    body = struct.pack('<BxHHH', 1, len(nm), len(dtype), len(dspace))
    body += nm + bytes(pad8(len(nm)) - len(nm))
    body += dtype + bytes(pad8(len(dtype)) - len(dtype))
    body += dspace + bytes(pad8(len(dspace)) - len(dspace))
    return body + data


def attr_v3(name, dtype, dspace, data):
    nm = name.encode() + b'\x00'
    body = struct.pack('<BBHHHB', 3, 0, len(nm), len(dtype), len(dspace), 0)
    return body + nm + dtype + dspace + data


def layout_contiguous(addr, size):
    return struct.pack('<BBQQ', 3, 1, addr, size)


def layout_chunked(btree_addr, chunk_dims, elem_size):
    body = struct.pack('<BBB', 3, 2, len(chunk_dims) + 1)
    body += struct.pack('<Q', btree_addr)
    for d in chunk_dims:
        body += struct.pack('<I', d)
    return body + struct.pack('<I', elem_size)


def filter_deflate(level=6):
    # filter pipeline v1: one filter, id 1 (deflate), one client value
    body = struct.pack('<BB2x4x', 1, 1)
    name = b'deflate\x00'
    body += struct.pack('<4H', 1, len(name), 1, 1) + name
    body += struct.pack('<I4x', level)  # odd # of client values -> pad 4
    return body


def chunk_btree(f: FileBuf, rank, entries):
    """entries: list of (rank-tuple of chunk offsets, nbytes, addr). One leaf.
    Keys carry rank+1 offsets — the trailing one is the element offset 0."""
    body = bytearray()
    body += b'TREE' + struct.pack('<BBH', 1, 0, len(entries))
    body += struct.pack('<QQ', UNDEF, UNDEF)

    def key(offsets, nbytes):
        k = struct.pack('<II', nbytes, 0)
        for o in offsets:
            k += struct.pack('<Q', o)
        return k + struct.pack('<Q', 0)

    for offsets, nbytes, addr in entries:
        body += key(offsets, nbytes) + struct.pack('<Q', addr)
    # final key: one past the last chunk
    last = entries[-1][0]
    body += key(tuple(o + 1 for o in last), 0)
    return f.append(bytes(body))


# ------------------------------------------------------- old-style groups ---
class LocalHeap:
    def __init__(self, f: FileBuf):
        self.f = f
        self.data = bytearray(8)  # offset 0: empty string (root link name)
        self.offsets = {}

    def add(self, name):
        off = len(self.data)
        nm = name.encode() + b'\x00'
        self.data += nm + bytes(pad8(len(nm)) - len(nm))
        self.offsets[name] = off
        return off

    def flush(self):
        seg = self.f.append(bytes(self.data))
        hdr = b'HEAP' + struct.pack('<B3x', 0)
        hdr += struct.pack('<QQQ', len(self.data), UNDEF, seg)
        return self.f.append(hdr)


def ste(link_off, oh_addr):
    return struct.pack('<QQI4x16x', link_off, oh_addr, 0)


def ste_soft(link_off, target_off):
    # cache type 2: symbolic entry; scratch starts with the heap offset of
    # the link target path
    return struct.pack('<QQI4xI12x', link_off, UNDEF, 2, target_off)


def group_v0(f: FileBuf, children):
    """children: {name: oh_addr | ('soft', target_path)}; returns group OH
    address."""
    heap = LocalHeap(f)
    entries = []
    for name in sorted(children):
        v = children[name]
        if isinstance(v, tuple) and v[0] == 'soft':
            t_off = heap.add(v[1])
            entries.append((heap.add(name), ('soft', t_off)))
        else:
            entries.append((heap.add(name), v))
    heap_addr = heap.flush()
    snod = b'SNOD' + struct.pack('<BxH', 1, len(entries))
    snod += b''.join(
        ste_soft(off, v[1]) if isinstance(v, tuple) else ste(off, v)
        for off, v in entries)
    snod_addr = f.append(snod)
    btree = b'TREE' + struct.pack('<BBH', 0, 0, 1)
    btree += struct.pack('<QQ', UNDEF, UNDEF)
    btree += struct.pack('<Q', 0)                    # key 0: empty string
    btree += struct.pack('<Q', snod_addr)            # child 0
    btree += struct.pack('<Q', entries[-1][0])       # key 1: largest name
    btree_addr = f.append(btree)
    stab = struct.pack('<QQ', btree_addr, heap_addr)
    return object_header_v1(f, [(0x11, stab)])


# ------------------------------------------------------------ the fixtures --
def f32_grid(h, w, scale=1.0):
    vals = [scale * (r * w + c) for r in range(h) for c in range(w)]
    return vals, b''.join(struct.pack('<f', v) for v in vals)


def chunked_dataset(f, h, w, ch, cw, compress=False):
    """Write chunk data + btree for an h x w f32 grid; edge chunks padded."""
    vals, _ = f32_grid(h, w)
    entries = []
    for r0 in range(0, h, ch):
        for c0 in range(0, w, cw):
            chunk = []
            for r in range(r0, r0 + ch):
                for c in range(c0, c0 + cw):
                    chunk.append(vals[r * w + c] if r < h and c < w else 0.0)
            raw = b''.join(struct.pack('<f', v) for v in chunk)
            if compress:
                raw = zlib.compress(raw, 6)
            addr = f.append(raw)
            entries.append(((r0, c0), len(raw), addr))
    btree_addr = chunk_btree(f, 2, entries)
    return btree_addr, vals


def make_v0(path: Path):
    f = FileBuf()
    f.alloc(96)  # superblock placeholder at offset 0
    gh = GlobalHeap(f)

    # vlen payloads (flush heap before anything references it)
    vlen_items = {
        'sample_name': b'caffeine powder',
        'units_m': b'm',
        'units_deg': b'degrees',
        'ax_a': b'time',
        'ax_b': b'q',
    }
    idx = {k: gh.add(v) for k, v in vlen_items.items()}
    gh_addr = gh.flush()

    def vref(key):
        return vlen_ref(gh_addr, idx[key], len(vlen_items[key]))

    # --- leaf datasets -------------------------------------------------
    # /entry1/instrument/configuration : f64 scalar, fixed-str units attr,
    # plus a NeXus-shaped numeric ARRAY attr (v1 message: padded name/
    # datatype/dataspace, unpadded data) -> comma-joined decode
    cfg_raw = f.append(struct.pack('<d', 3.0))
    cfg = object_header_v1(f, [
        (0x01, space_scalar()),
        (0x03, dt_f64()),
        (0x08, layout_contiguous(cfg_raw, 8)),
        (0x0C, attr_v1('units', dt_str(14), space_scalar(),
                       b'dimensionless\x00')),
        (0x0C, attr_v1('vector', dt_f64(), space_simple([3]),
                       struct.pack('<3d', 0.0, 0.0, 1.0))),
        # string ARRAY attrs, the NeXus `axes` name-list shape: fixed-
        # width elements at the type's stride, and vlen elements as
        # 16-byte global-heap refs
        (0x0C, attr_v1('axes', dt_str(5), space_simple([2]),
                       b'time\x00q\x00\x00\x00\x00')),
        (0x0C, attr_v1('axes_v', dt_vlen_str(), space_simple([2]),
                       vref('ax_a') + vref('ax_b'))),
    ])

    # /entry1/instrument/n_frames : i64 scalar
    nf_raw = f.append(struct.pack('<q', 42))
    nframes = object_header_v1(f, [
        (0x01, space_scalar()),
        (0x03, dt_i64()),
        (0x08, layout_contiguous(nf_raw, 8)),
    ])

    # /entry1/sample/thickness : f64 scalar with VLEN units attr 'm'
    th_raw = f.append(struct.pack('<d', 0.00123))
    thickness = object_header_v1(f, [
        (0x01, space_scalar()),
        (0x03, dt_f64()),
        (0x08, layout_contiguous(th_raw, 8)),
        (0x0C, attr_v1('units', dt_vlen_str(), space_scalar(), vref('units_m'))),
    ])

    # /entry1/sample/name : vlen string scalar dataset
    nm_raw = f.append(vref('sample_name'))
    name = object_header_v1(f, [
        (0x01, space_scalar()),
        (0x03, dt_vlen_str()),
        (0x08, layout_contiguous(nm_raw, 16)),
    ])

    # /entry1/sample/position : fixed string dataset
    pos_bytes = b'top_left\x00\x00\x00\x00'
    pos_raw = f.append(pos_bytes)
    position = object_header_v1(f, [
        (0x01, space_scalar()),
        (0x03, dt_str(len(pos_bytes))),
        (0x08, layout_contiguous(pos_raw, len(pos_bytes))),
    ])

    # /entry1/sample/angles : 1-D f64 array (contiguous)
    angles_vals = [0.0, 0.5, 1.0, 1.5]
    ang_raw = f.append(b''.join(struct.pack('<d', v) for v in angles_vals))
    angles = object_header_v1(f, [
        (0x01, space_simple([4])),
        (0x03, dt_f64()),
        (0x08, layout_contiguous(ang_raw, 32)),
        (0x0C, attr_v1('units', dt_vlen_str(), space_scalar(), vref('units_deg'))),
    ])

    # /entry1/detector/data : 6x5 f32 contiguous image
    H, W = 6, 5
    _, img_bytes = f32_grid(H, W)
    img_raw = f.append(img_bytes)
    data = object_header_v1(f, [
        (0x01, space_simple([H, W])),
        (0x03, dt_f32()),
        (0x08, layout_contiguous(img_raw, len(img_bytes))),
    ])

    # /entry1/detector/chunked : same grid, 4x4 chunks (edge-padded)
    cb, _ = chunked_dataset(f, H, W, 4, 4, compress=False)
    chunked = object_header_v1(f, [
        (0x01, space_simple([H, W])),
        (0x03, dt_f32()),
        (0x08, layout_chunked(cb, [4, 4], 4)),
    ])

    # /entry1/detector/compressed : same grid, 4x4 chunks, deflate
    cbz, _ = chunked_dataset(f, H, W, 4, 4, compress=True)
    compressed = object_header_v1(f, [
        (0x01, space_simple([H, W])),
        (0x03, dt_f32()),
        (0x0B, filter_deflate()),
        (0x08, layout_chunked(cbz, [4, 4], 4)),
    ])

    # --- groups, bottom-up ----------------------------------------------
    instrument = group_v0(f, {'configuration': cfg, 'n_frames': nframes})
    sample = group_v0(f, {'thickness': thickness, 'name': name,
                          'position': position, 'angles': angles})
    # alias_data: NeXus-style hard link (same object header, second path);
    # soft_cfg: old-style symbolic entry targeting an absolute path
    detector = group_v0(f, {'data': data, 'chunked': chunked,
                            'compressed': compressed, 'alias_data': data,
                            'soft_cfg': ('soft', '/entry1/instrument/configuration')})
    entry1 = group_v0(f, {'instrument': instrument, 'sample': sample,
                          'detector': detector})
    root = group_v0(f, {'entry1': entry1})

    # --- superblock v0 ----------------------------------------------------
    sb = bytearray()
    sb += bytes([0x89]) + b'HDF' + bytes([0x0D, 0x0A, 0x1A, 0x0A])
    sb += struct.pack('<8B', 0, 0, 0, 0, 0, 8, 8, 0)
    sb += struct.pack('<HHI', 4, 16, 0)
    sb += struct.pack('<QQQQ', 0, UNDEF, len(f.buf), UNDEF)
    sb += ste(0, root)
    f.write(0, bytes(sb))
    path.write_bytes(bytes(f.buf))


def link_msg(name, oh_addr):
    nm = name.encode()
    return struct.pack('<BBB', 1, 0, len(nm)) + nm + struct.pack('<Q', oh_addr)


def soft_link_msg(name, target):
    # flags 0x08: explicit link-type field; type 1 = soft; u16-length target
    nm = name.encode()
    t = target.encode()
    return (struct.pack('<BBBB', 1, 0x08, 1, len(nm)) + nm +
            struct.pack('<H', len(t)) + t)


def ext_link_msg(name, file_name, obj_path):
    # type 64 = external; blob = version/flags byte + file\0 + objpath\0
    nm = name.encode()
    blob = b'\x00' + file_name.encode() + b'\x00' + obj_path.encode() + b'\x00'
    return (struct.pack('<BBBB', 1, 0x08, 64, len(nm)) + nm +
            struct.pack('<H', len(blob)) + blob)


def link_info_msg():
    return struct.pack('<BBQQ', 0, 0, UNDEF, UNDEF)


def group_v2(f: FileBuf, children):
    msgs = [(0x02, link_info_msg())]
    msgs += [(0x06, link_msg(n, a)) for n, a in sorted(children.items())]
    return object_header_v2(f, msgs)


def make_v2(path: Path):
    f = FileBuf()
    f.alloc(48)  # superblock v2 placeholder
    gh = GlobalHeap(f)
    i_units = gh.add(b'mm')
    i_note = gh.add(b'powder A')
    gh_addr = gh.flush()

    # /entry1/detector/distance : f64 scalar, vlen units attr (v3 attrs)
    d_raw = f.append(struct.pack('<d', 2507.5))
    dist = object_header_v2(f, [
        (0x01, space_scalar()),
        (0x03, dt_f64()),
        (0x08, layout_contiguous(d_raw, 8)),
        (0x0C, attr_v3('units', dt_vlen_str(), space_scalar(),
                       vlen_ref(gh_addr, i_units, 2))),
    ])

    # /entry1/detector/frame : 3x4 f32 contiguous
    H, W = 3, 4
    _, img = f32_grid(H, W, scale=0.5)
    img_raw = f.append(img)
    frame = object_header_v2(f, [
        (0x01, space_simple([H, W])),
        (0x03, dt_f32()),
        (0x08, layout_contiguous(img_raw, len(img))),
    ])

    # uint32 image with the Eiger gap-pixel sentinel 2^32-1 (must survive
    # decode EXACTLY — it exceeds Float's 24-bit mantissa) and a uint64
    # scalar past Long.MaxValue
    u32_raw = f.append(struct.pack('<3I', 0, 0xFFFFFFFF, 7))
    u32arr = object_header_v2(f, [
        (0x01, space_simple([3])),
        (0x03, dt_u32()),
        (0x08, layout_contiguous(u32_raw, 12)),
    ])
    u64_raw = f.append(struct.pack('<Q', (1 << 63) + 5))
    u64big = object_header_v2(f, [
        (0x01, space_scalar()),
        (0x03, dt_u64()),
        (0x08, layout_contiguous(u64_raw, 8)),
    ])

    # compound datasets (class 6), flat scalar members — the common NeXus
    # table shape. One scalar element with a v1-encoded datatype, one
    # 3-element array with a v3-encoded datatype (offsets in minimal bytes).
    def member_v1(name, offset, dt, dims=()):
        # v1 members carry their own dims (pre-class-10 array members):
        # dimensionality byte + permutation + reserved + four dim slots
        nm = name.encode() + b'\x00'
        nm += bytes(pad8(len(nm)) - len(nm))
        ds = (list(dims) + [0, 0, 0, 0])[:4]
        return nm + struct.pack('<IB3xII4I', offset, len(dims), 0, 0, *ds) + dt

    def member_v3(name, offset, dt, off_bytes):
        return name.encode() + b'\x00' + \
            offset.to_bytes(off_bytes, 'little') + dt

    def dt_compound(version, size, members_enc):
        return struct.pack('<BBBBI', (version << 4) | 6,
                           len(members_enc) & 0xFF,
                           (len(members_enc) >> 8) & 0xFF, 0, size) + \
            b''.join(members_enc)

    # scalar: {x: f64, note: vlen str, n: i64, tag: 4-char str} (v1
    # members, size 36). The vlen member sits MID-STRUCT on purpose: its
    # base-datatype encoding must be consumed or every later member
    # misparses — n and tag after it prove position-correct parsing.
    cmp_raw = f.append(struct.pack('<d', 1.25) + vlen_ref(gh_addr, i_note, 8) +
                       struct.pack('<q4s', 42, b'roi\x00'))
    cmp_scalar = object_header_v2(f, [
        (0x01, space_scalar()),
        (0x03, dt_compound(1, 36, [
            member_v1('x', 0, dt_f64()),
            member_v1('note', 8, dt_vlen_str()),
            member_v1('n', 24, dt_i64()),
            member_v1('tag', 32, dt_str(4)),
        ])),
        (0x08, layout_contiguous(cmp_raw, 36)),
    ])
    # array[3]: {t: f32, v: f64} (v3 members, size 12 -> 1-byte offsets)
    rows = b''.join(struct.pack('<fd', 0.5 * i, 10.0 + i) for i in range(3))
    arr_raw = f.append(rows)
    cmp_array = object_header_v2(f, [
        (0x01, space_simple([3])),
        (0x03, dt_compound(3, 12, [
            member_v3('t', 0, dt_f32(), 1),
            member_v3('v', 4, dt_f64(), 1),
        ])),
        (0x08, layout_contiguous(arr_raw, len(rows))),
    ])

    # enum (class 8) over i32: reads as the base integer, h5py-style
    def dt_i32():
        return struct.pack('<B3sI2H', 0x10, bytes([0x08, 0x00, 0x00]), 4, 0, 32)

    def dt_enum_v1(base, base_fmt, names_values):
        n = len(names_values)
        props = base
        for name, _ in names_values:
            nm = name.encode() + b'\x00'
            props += nm + bytes(pad8(len(nm)) - len(nm))
        props += b''.join(struct.pack(base_fmt, v) for _, v in names_values)
        return struct.pack('<B3BI', 0x18, n & 0xFF, (n >> 8) & 0xFF, 0, 4) + props

    mode_raw = f.append(struct.pack('<i', 1))
    mode = object_header_v2(f, [
        (0x01, space_scalar()),
        (0x03, dt_enum_v1(dt_i32(), '<i', [('OFF', 0), ('ON', 1)])),
        (0x08, layout_contiguous(mode_raw, 4)),
        # compound-typed attr: opaque for scalar-attr reads, must be
        # SKIPPED (dataset still parses), never a file-aborting failure
        (0x0C, attr_v3('range', dt_compound(3, 16, [
            member_v3('lo', 0, dt_f64(), 1),
            member_v3('hi', 8, dt_f64(), 1),
        ]), space_scalar(), struct.pack('<dd', 0.0, 2.0))),
        # compound attr with a VLEN-SEQUENCE member: the member datatype
        # itself fails to parse — the attribute (never the file) is skipped
        (0x0C, attr_v3('label', dt_compound(3, 16, [
            member_v3('s', 0, dt_vlen_seq(), 1),
        ]), space_scalar(), bytes(16))),
        # f16-typed attr: an unsupported FLOAT WIDTH must also skip the
        # attribute, not abort the file (h5py writes np.float16 attrs)
        (0x0C, attr_v3('half', dt_f16(), space_scalar(), bytes(2))),
        # numeric ARRAY attrs (v3 message, no padding): i32 triple and a
        # 2x2 f64 (flattens row-major) -> comma-joined decode
        (0x0C, attr_v3('axes_i', dt_i32(), space_simple([3]),
                       struct.pack('<3i', 1, 2, 3))),
        (0x0C, attr_v3('mat', dt_f64(), space_simple([2, 2]),
                       struct.pack('<4d', 1.5, 2.5, 3.5, 4.5))),
        # an OVERSIZED numeric array attr (> 256 elements) is data
        # mislabeled as metadata: skipped, never decoded or aborting
        (0x0C, attr_v3('big', dt_f64(), space_simple([300]),
                       struct.pack('<300d', *range(300)))),
    ])

    # nested compound: {t: f32 @0, pos: {x: f64, y: f64} @8} (size 24) —
    # must flatten to members t, pos.x, pos.y with absolute offsets
    nest_raw = f.append(struct.pack('<f4xdd', 1.5, 2.25, 3.5))
    nested = object_header_v2(f, [
        (0x01, space_scalar()),
        (0x03, dt_compound(3, 24, [
            member_v3('t', 0, dt_f32(), 1),
            member_v3('pos', 8, dt_compound(3, 16, [
                member_v3('x', 0, dt_f64(), 1),
                member_v3('y', 8, dt_f64(), 1),
            ]), 1),
        ])),
        (0x08, layout_contiguous(nest_raw, 24)),
    ])

    # array datatype (class 10, v3): dataspace [2] of f32[3] elements ->
    # reads as a [2,3] f32 dataset (h5py folds the element dims)
    vec_raw = f.append(b''.join(struct.pack('<f', float(i)) for i in range(6)))
    vectors = object_header_v2(f, [
        (0x01, space_simple([2])),
        (0x03, dt_array(dt_f32(), 4, [3])),
        (0x08, layout_contiguous(vec_raw, 24)),
    ])
    # v2-encoded array type (reserved + permutation bytes) over a SCALAR
    # dataspace: a lone f64[2,2] element -> reads as a [2,2] dataset
    ten_raw = f.append(b''.join(struct.pack('<d', 10.0 + i) for i in range(4)))
    tensor = object_header_v2(f, [
        (0x01, space_scalar()),
        (0x03, dt_array(dt_f64(), 8, [2, 2], version=2)),
        (0x08, layout_contiguous(ten_raw, 32)),
    ])

    # compound with an ARRAY-TYPED member (class 10): dataspace [2] of
    # {t: f32 @0, xy: f32[3,2] @4} (size 28) — xy folds to a [2,3,2] column
    traj_rows = b''.join(
        struct.pack('<f', 0.5 * i) +
        b''.join(struct.pack('<f', 100.0 * i + j) for j in range(6))
        for i in range(2))
    traj_raw = f.append(traj_rows)
    traj = object_header_v2(f, [
        (0x01, space_simple([2])),
        (0x03, dt_compound(3, 28, [
            member_v3('t', 0, dt_f32(), 1),
            member_v3('xy', 4, dt_array(dt_f32(), 4, [3, 2]), 1),
        ])),
        (0x08, layout_contiguous(traj_raw, len(traj_rows))),
    ])
    # v1 members with their OWN dims (the pre-class-10 array-member
    # encoding): scalar {bias: f64 @0, gain: f64[4] @8} (size 40)
    cal_raw = f.append(struct.pack('<5d', 1.0, 2.0, 3.0, 4.0, 5.0))
    cal = object_header_v2(f, [
        (0x01, space_scalar()),
        (0x03, dt_compound(1, 40, [
            member_v1('bias', 0, dt_f64()),
            member_v1('gain', 8, dt_f64(), dims=[4]),
        ])),
        (0x08, layout_contiguous(cal_raw, 40)),
    ])

    detector = group_v2(f, {'distance': dist, 'frame': frame,
                            'u32_pixels': u32arr, 'u64_count': u64big,
                            'roi': cmp_scalar, 'table': cmp_array,
                            'mode': mode, 'vectors': vectors,
                            'tensor': tensor, 'nested': nested,
                            'traj': traj, 'cal': cal})
    # soft link + external link (the Eiger master shape:
    # /entry/data/data_000001 -> another file)
    entry1 = object_header_v2(f, [
        (0x02, link_info_msg()),
        (0x06, link_msg('detector', detector)),
        (0x06, soft_link_msg('soft_dist', '/entry1/detector/distance')),
        (0x06, ext_link_msg('data_000001', 'mouse_v2_data_000001.h5',
                            '/entry/data/data')),
    ])
    root = group_v2(f, {'entry1': entry1})

    sb = bytearray()
    sb += bytes([0x89]) + b'HDF' + bytes([0x0D, 0x0A, 0x1A, 0x0A])
    sb += struct.pack('<4B', 2, 8, 8, 0)
    sb += struct.pack('<QQQQ', 0, UNDEF, len(f.buf), root)
    sb += struct.pack('<I', lookup3(bytes(sb)))
    f.write(0, bytes(sb))
    path.write_bytes(bytes(f.buf))


# ----------------------------------------------- lz4 / bitshuffle filters --
def lz4_literals(data: bytes) -> bytes:
    """A valid LZ4 block containing only literals (no matches). Any real
    LZ4 decoder — the reader uses lz4-java — accepts it."""
    n = len(data)
    if n < 15:
        return bytes([n << 4]) + data
    out = bytearray([0xF0])
    rem = n - 15
    while rem >= 255:
        out.append(255)
        rem -= 255
    out.append(rem)
    return bytes(out) + data


def lz4_filter_stream(data: bytes, block_size: int) -> bytes:
    """HDF5Plugin LZ4 (32004) framing: BE u64 total, BE u32 block size,
    then per block BE u32 stored size + payload."""
    out = struct.pack('>QI', len(data), block_size)
    for i in range(0, len(data), block_size):
        block = lz4_literals(data[i:i + block_size])
        out += struct.pack('>I', len(block)) + block
    return out


def bitshuffle_block(data: bytes, elem_size: int) -> bytes:
    """The bitshuffle bit transpose of one block (scalar reference
    algorithm): byte-plane-major, then bit (LSB first), packs of 8
    elements with element 8k+i at bit i."""
    n = len(data) // elem_size
    packs = n // 8
    out = bytearray(len(data))
    for j in range(elem_size):
        for b in range(8):
            for k in range(packs):
                v = 0
                for i in range(8):
                    if (data[(8 * k + i) * elem_size + j] >> b) & 1:
                        v |= 1 << i
                out[(j * 8 + b) * packs + k] = v
    return bytes(out)


def bitshuffle_lz4_stream(data: bytes, elem_size: int, block_elems: int) -> bytes:
    """Bitshuffle (32008) with internal LZ4: BE u64 total bytes, BE u32
    block size in bytes, then per block BE u32 compressed size + LZ4 data.
    Final sub-block rounds down to a multiple of 8 elements; the last
    n % 8 elements travel raw at the end."""
    n = len(data) // elem_size
    out = struct.pack('>QI', len(data), block_elems * elem_size)
    pos = 0
    def emit(nelems):
        nonlocal out, pos
        raw = data[pos * elem_size:(pos + nelems) * elem_size]
        block = lz4_literals(bitshuffle_block(raw, elem_size))
        out += struct.pack('>I', len(block)) + block
        pos += nelems
    while n - pos >= block_elems:
        emit(block_elems)
    sub = (n - pos) & ~7
    if sub:
        emit(sub)
    out += data[pos * elem_size:]
    return out


def bitshuffle_raw_stream(data: bytes, elem_size: int, block_elems: int) -> bytes:
    """Bitshuffle without internal compression: blocked transpose laid out
    back to back, no headers; same final-sub-block + raw-tail rules."""
    n = len(data) // elem_size
    out = b''
    pos = 0
    while n - pos >= block_elems:
        out += bitshuffle_block(
            data[pos * elem_size:(pos + block_elems) * elem_size], elem_size)
        pos += block_elems
    sub = (n - pos) & ~7
    if sub:
        out += bitshuffle_block(
            data[pos * elem_size:(pos + sub) * elem_size], elem_size)
        pos += sub
    out += data[pos * elem_size:]
    return out


def filter_generic(fid, values, name=b''):
    """Filter-pipeline v1 message with one filter and u32 client values."""
    return filter_pipeline([(fid, name, values)])


def filter_pipeline(filters):
    """Filter-pipeline v1 message; filters = [(fid, name_bytes, values)] in
    WRITE order (read undoes them back to front)."""
    body = struct.pack('<BB2x4x', 1, len(filters))
    for fid, name, values in filters:
        nm = name + b'\x00' if name else b''
        nm += bytes(pad8(len(nm)) - len(nm)) if nm else b''
        body += struct.pack('<4H', fid, len(nm), 1, len(values)) + nm
        for v in values:
            body += struct.pack('<I', v)
        if len(values) % 2 == 1:
            body += b'\x00' * 4
    return body


def shuffle_bytes(data, esz):
    """Filter 2 byte transpose: all byte-0s, then all byte-1s, ...;
    trailing partial-element bytes stay in place."""
    n = len(data) // esz
    out = bytearray(len(data))
    k = 0
    for j in range(esz):
        for i in range(n):
            out[k] = data[i * esz + j]
            k += 1
    out[n * esz:] = data[n * esz:]
    return bytes(out)


def fletcher32(data):
    """HDF5's modified fletcher-32 (public H5checksum algorithm)."""
    sum1 = sum2 = 0
    i = 0
    words = len(data) // 2
    while words:
        tlen = min(360, words)
        words -= tlen
        for _ in range(tlen):
            sum1 += (data[i] << 8) | data[i + 1]
            i += 2
            sum2 += sum1
        sum1 = (sum1 & 0xFFFF) + (sum1 >> 16)
        sum2 = (sum2 & 0xFFFF) + (sum2 >> 16)
    if len(data) % 2:
        sum1 += data[i] << 8
        sum2 += sum1
        sum1 = (sum1 & 0xFFFF) + (sum1 >> 16)
        sum2 = (sum2 & 0xFFFF) + (sum2 >> 16)
    sum1 = (sum1 & 0xFFFF) + (sum1 >> 16)
    sum2 = (sum2 & 0xFFFF) + (sum2 >> 16)
    return ((sum2 & 0xFFFF) << 16) | (sum1 & 0xFFFF)


# ------------------------------------------------- v4 chunked layouts ------
def layout_v4_single(addr, chunk_dims, filtered_size=None, filter_mask=0):
    """Layout v4, class 2, Single Chunk index (type 1). Chunk dims are in
    ELEMENTS and the trailing datatype-size dim of v3 is NOT stored."""
    flags = 0x02 if filtered_size is not None else 0x00
    body = struct.pack('<BBBBB', 4, 2, flags, len(chunk_dims) + 1, 8)
    body += b''.join(struct.pack('<Q', d) for d in chunk_dims)
    body += struct.pack('<B', 1)
    if filtered_size is not None:
        body += struct.pack('<QI', filtered_size, filter_mask)
    return body + struct.pack('<Q', addr)


def layout_v4_implicit(addr, chunk_dims):
    """Layout v4, class 2, Implicit index (type 2): unfiltered fixed-size
    chunks laid out contiguously in row-major grid order from addr."""
    body = struct.pack('<BBBBB', 4, 2, 0, len(chunk_dims) + 1, 8)
    body += b''.join(struct.pack('<Q', d) for d in chunk_dims)
    return body + struct.pack('<B', 2) + struct.pack('<Q', addr)


def fixed_array(f: FileBuf, elements, filtered):
    """Write FADB + FAHD for a non-paged Fixed Array chunk index.
    elements: [(addr, nbytes, mask)]; returns the FAHD address."""
    client = 1 if filtered else 0
    entry_size = 8 + 4 + 4 if filtered else 8  # addr + u32 size + u32 mask
    page_bits = 10
    if filtered:
        elems = b''.join(struct.pack('<QII', a, n, m) for a, n, m in elements)
    else:
        elems = b''.join(struct.pack('<Q', a) for a, _, _ in elements)
    # data block first (needs no forward pointer to the header-to-be? it
    # stores the header address, so reserve the header slot up front)
    hdr_addr = f.alloc(4 + 4 + 8 + 8 + 4)  # sig,ver,client,esize,pbits + entries + dbaddr + csum
    db = b'FADB' + struct.pack('<BB', 0, client) + struct.pack('<Q', hdr_addr) + elems
    db += struct.pack('<I', lookup3(db))
    db_addr = f.append(db)
    hdr = b'FAHD' + struct.pack('<4B', 0, client, entry_size, page_bits)
    hdr += struct.pack('<QQ', len(elements), db_addr)
    hdr += struct.pack('<I', lookup3(hdr))
    f.write(hdr_addr, hdr)
    return hdr_addr


def layout_v4_fixed_array(addr, chunk_dims, page_bits=10):
    body = struct.pack('<BBBBB', 4, 2, 0, len(chunk_dims) + 1, 8)
    body += b''.join(struct.pack('<Q', d) for d in chunk_dims)
    return body + struct.pack('<BB', 3, page_bits) + struct.pack('<Q', addr)


def v4_chunk_data(f, h, w, ch, cw, compress=False, contiguous=False):
    """Write chunk payloads for an h x w f32 grid in row-major grid order.
    Returns ([(addr, nbytes, mask)], base_addr)."""
    vals, _ = f32_grid(h, w)
    chunks = []
    for r0 in range(0, h, ch):
        for c0 in range(0, w, cw):
            chunk = []
            for r in range(r0, r0 + ch):
                for c in range(c0, c0 + cw):
                    chunk.append(vals[r * w + c] if r < h and c < w else 0.0)
            raw = b''.join(struct.pack('<f', v) for v in chunk)
            if compress:
                raw = zlib.compress(raw, 6)
            chunks.append(raw)
    if contiguous:  # implicit index: back-to-back, unaligned gaps forbidden
        base = f.append(b''.join(chunks))
        sizes = [(base + i * len(chunks[0]), len(chunks[0]), 0)
                 for i in range(len(chunks))]
        return sizes, base
    entries = [(f.append(raw), len(raw), 0) for raw in chunks]
    return entries, entries[0][0]


def make_v4(path: Path):
    """Superblock v3 + OHDR v2 + data-layout v4: the file shape recent
    libhdf5 writes (and Eiger detector files use). Covers Single Chunk
    (plain + deflate), Implicit, and Fixed Array (plain + deflate)."""
    f = FileBuf()
    f.alloc(48)  # superblock v3 placeholder

    H, W = 6, 5
    vals, img_bytes = f32_grid(H, W)

    # single : one 6x5 chunk, unfiltered
    s_addr = f.append(img_bytes)
    single = object_header_v2(f, [
        (0x01, space_simple([H, W])),
        (0x03, dt_f32()),
        (0x08, layout_v4_single(s_addr, [H, W])),
    ])

    # single_z : one 6x5 chunk, deflate (flags bit1 -> size+mask in message)
    z = zlib.compress(img_bytes, 6)
    sz_addr = f.append(z)
    single_z = object_header_v2(f, [
        (0x01, space_simple([H, W])),
        (0x03, dt_f32()),
        (0x0B, filter_deflate()),
        (0x08, layout_v4_single(sz_addr, [H, W], filtered_size=len(z))),
    ])

    # shufz : shuffle (byte transpose) + deflate — the classic h5py
    # `shuffle=True, compression='gzip'` recipe
    shz = zlib.compress(shuffle_bytes(img_bytes, 4), 6)
    shz_addr = f.append(shz)
    shufz = object_header_v2(f, [
        (0x01, space_simple([H, W])),
        (0x03, dt_f32()),
        (0x0B, filter_pipeline([(2, b'shuffle', [4]),
                                (1, b'deflate', [6])])),
        (0x08, layout_v4_single(shz_addr, [H, W], filtered_size=len(shz))),
    ])

    # fletch : fletcher32 alone (stored = payload + LE u32 checksum)
    fl = img_bytes + struct.pack('<I', fletcher32(img_bytes))
    fl_addr = f.append(fl)
    fletch = object_header_v2(f, [
        (0x01, space_simple([H, W])),
        (0x03, dt_f32()),
        (0x0B, filter_pipeline([(3, b'fletcher32', [])])),
        (0x08, layout_v4_single(fl_addr, [H, W], filtered_size=len(fl))),
    ])

    # fzd : netCDF-C write order — shuffle, FLETCHER32, deflate: the
    # checksum sits INSIDE the compressed stream, so the read side must
    # inflate to chunk+4 bytes before stripping (both orders are valid)
    pay = shuffle_bytes(img_bytes, 4)
    pay += struct.pack('<I', fletcher32(pay))
    fzd_bytes = zlib.compress(pay, 6)
    fzd_addr = f.append(fzd_bytes)
    fzd = object_header_v2(f, [
        (0x01, space_simple([H, W])),
        (0x03, dt_f32()),
        (0x0B, filter_pipeline([(2, b'shuffle', [4]),
                                (3, b'fletcher32', []),
                                (1, b'deflate', [6])])),
        (0x08, layout_v4_single(fzd_addr, [H, W],
                                filtered_size=len(fzd_bytes))),
    ])

    # shufzf : shuffle + deflate + fletcher32 — the full classic pipeline;
    # the checksum covers the COMPRESSED stream (write order)
    szf = zlib.compress(shuffle_bytes(img_bytes, 4), 6)
    szf += struct.pack('<I', fletcher32(szf))
    szf_addr = f.append(szf)
    shufzf = object_header_v2(f, [
        (0x01, space_simple([H, W])),
        (0x03, dt_f32()),
        (0x0B, filter_pipeline([(2, b'shuffle', [4]), (1, b'deflate', [6]),
                                (3, b'fletcher32', [])])),
        (0x08, layout_v4_single(szf_addr, [H, W], filtered_size=len(szf))),
    ])

    # zstdds : HDF5Plugin Zstandard (32015) — one raw zstd frame per chunk;
    # compressed with the zstd CLI (no python zstd binding in this
    # container), decoded by the zstd-jni on Spark's classpath
    import subprocess
    zs = subprocess.run(['zstd', '-q', '-c'], input=img_bytes,
                        stdout=subprocess.PIPE, check=True).stdout
    zs_addr = f.append(zs)
    zstdds = object_header_v2(f, [
        (0x01, space_simple([H, W])),
        (0x03, dt_f32()),
        (0x0B, filter_generic(32015, [3], name=b'zstd')),
        (0x08, layout_v4_single(zs_addr, [H, W], filtered_size=len(zs))),
    ])

    # implicit : 2x5 chunks laid contiguously (3 whole-row chunks, no edge)
    _, base = v4_chunk_data(f, H, W, 2, W, contiguous=True)
    implicit = object_header_v2(f, [
        (0x01, space_simple([H, W])),
        (0x03, dt_f32()),
        (0x08, layout_v4_implicit(base, [2, W])),
    ])

    # fixedarr : 4x4 chunks (2x2 grid, padded edges) via FAHD/FADB
    entries, _ = v4_chunk_data(f, H, W, 4, 4, compress=False)
    fa = fixed_array(f, entries, filtered=False)
    fixedarr = object_header_v2(f, [
        (0x01, space_simple([H, W])),
        (0x03, dt_f32()),
        (0x08, layout_v4_fixed_array(fa, [4, 4])),
    ])

    # fixedarr_z : same grid, deflate, client-1 elements (addr+size+mask)
    entries_z, _ = v4_chunk_data(f, H, W, 4, 4, compress=True)
    fa_z = fixed_array(f, entries_z, filtered=True)
    fixedarr_z = object_header_v2(f, [
        (0x01, space_simple([H, W])),
        (0x03, dt_f32()),
        (0x0B, filter_deflate()),
        (0x08, layout_v4_fixed_array(fa_z, [4, 4])),
    ])

    # single_skip : deflate DECLARED but the chunk's filter mask bit 0 set
    # (libhdf5 writes raw chunks when a filter fails on that chunk) — the
    # payload is stored UNCOMPRESSED and must decode via the mask
    skip_addr = f.append(img_bytes)
    single_skip = object_header_v2(f, [
        (0x01, space_simple([H, W])),
        (0x03, dt_f32()),
        (0x0B, filter_deflate()),
        (0x08, layout_v4_single(skip_addr, [H, W],
                                filtered_size=len(img_bytes), filter_mask=1)),
    ])

    # lz4 : one chunk through the HDF5Plugin LZ4 filter (id 32004),
    # two 64-byte blocks so the block loop is exercised
    lz4_stream = lz4_filter_stream(img_bytes, 64)
    lz4_addr = f.append(lz4_stream)
    lz4ds = object_header_v2(f, [
        (0x01, space_simple([H, W])),
        (0x03, dt_f32()),
        (0x0B, filter_generic(32004, [64])),
        (0x08, layout_v4_single(lz4_addr, [H, W], filtered_size=len(lz4_stream))),
    ])

    # bitshuf_z : bitshuffle (32008) with internal LZ4 — 8-element blocks
    # (3 full blocks + 6-element raw tail for the 30-element grid)
    bs_stream = bitshuffle_lz4_stream(img_bytes, 4, 8)
    bs_addr = f.append(bs_stream)
    bitshuf_z = object_header_v2(f, [
        (0x01, space_simple([H, W])),
        (0x03, dt_f32()),
        (0x0B, filter_generic(32008, [0, 4, 4, 8, 2])),
        (0x08, layout_v4_single(bs_addr, [H, W], filtered_size=len(bs_stream))),
    ])

    # bitshuf_raw : bitshuffle without internal compression (cd comp = 0)
    bsr_stream = bitshuffle_raw_stream(img_bytes, 4, 8)
    bsr_addr = f.append(bsr_stream)
    bitshuf_raw = object_header_v2(f, [
        (0x01, space_simple([H, W])),
        (0x03, dt_f32()),
        (0x0B, filter_generic(32008, [0, 4, 4, 8, 0])),
        (0x08, layout_v4_single(bsr_addr, [H, W], filtered_size=len(bsr_stream))),
    ])

    detector = group_v2(f, {'single': single, 'single_z': single_z,
                            'single_skip': single_skip,
                            'implicit': implicit, 'fixedarr': fixedarr,
                            'fixedarr_z': fixedarr_z, 'lz4': lz4ds,
                            'bitshuf_z': bitshuf_z, 'bitshuf_raw': bitshuf_raw,
                            'shufz': shufz, 'fletch': fletch,
                            'shufzf': shufzf, 'fzd': fzd, 'zstd': zstdds})
    entry1 = group_v2(f, {'detector': detector})
    root = group_v2(f, {'entry1': entry1})

    sb = bytearray()
    sb += bytes([0x89]) + b'HDF' + bytes([0x0D, 0x0A, 0x1A, 0x0A])
    sb += struct.pack('<4B', 3, 8, 8, 0)  # v3: same shape as v2
    sb += struct.pack('<QQQQ', 0, UNDEF, len(f.buf), root)
    sb += struct.pack('<I', lookup3(bytes(sb)))
    f.write(0, bytes(sb))
    path.write_bytes(bytes(f.buf))


def make_bad_deflate(path: Path):
    """A chunked+deflate dataset whose chunk bytes are TRUNCATED — the
    reader must fail loudly, not hang or zero-fill."""
    f = FileBuf()
    f.alloc(48)
    _, img = f32_grid(4, 4)
    z = zlib.compress(img, 6)
    addr = f.append(z[:len(z) // 2])
    ds = object_header_v2(f, [
        (0x01, space_simple([4, 4])),
        (0x03, dt_f32()),
        (0x0B, filter_deflate()),
        (0x08, layout_v4_single(addr, [4, 4], filtered_size=len(z) // 2)),
    ])
    root = group_v2(f, {'bad': ds})
    sb = bytearray()
    sb += bytes([0x89]) + b'HDF' + bytes([0x0D, 0x0A, 0x1A, 0x0A])
    sb += struct.pack('<4B', 3, 8, 8, 0)
    sb += struct.pack('<QQQQ', 0, UNDEF, len(f.buf), root)
    sb += struct.pack('<I', lookup3(bytes(sb)))
    f.write(0, bytes(sb))
    path.write_bytes(bytes(f.buf))


def make_bigendian(path: Path):
    """Big-endian numerics (the conversion-tool / cross-platform output
    shape): BE f32 array, BE f64 scalar, BE signed i64 scalar, and a BE
    u32 sentinel array — all must decode exactly through a BE buffer."""
    f = FileBuf()
    f.alloc(48)

    def dt_f32_be():
        return struct.pack('<B3sI2H4BI', 0x11, bytes([0x21, 0x1F, 0x00]), 4,
                           0, 32, 23, 8, 0, 23, 127)

    def dt_f64_be():
        return struct.pack('<B3sI2H4BI', 0x11, bytes([0x21, 0x3F, 0x00]), 8,
                           0, 64, 52, 11, 0, 52, 1023)

    def dt_i64_be():
        return struct.pack('<B3sI2H', 0x10, bytes([0x09, 0x00, 0x00]), 8, 0, 64)

    def dt_u32_be():
        return struct.pack('<B3sI2H', 0x10, bytes([0x01, 0x00, 0x00]), 4, 0, 32)

    arr = b''.join(struct.pack('>f', i * 1.5) for i in range(6))
    f32arr = object_header_v2(f, [
        (0x01, space_simple([2, 3])), (0x03, dt_f32_be()),
        (0x08, layout_contiguous(f.append(arr), len(arr)))])
    f64s = object_header_v2(f, [
        (0x01, space_scalar()), (0x03, dt_f64_be()),
        (0x08, layout_contiguous(f.append(struct.pack('>d', 6.25)), 8))])
    i64s = object_header_v2(f, [
        (0x01, space_scalar()), (0x03, dt_i64_be()),
        (0x08, layout_contiguous(f.append(struct.pack('>q', -42)), 8))])
    u32raw = struct.pack('>II', 0xFFFFFFFF, 7)
    u32arr = object_header_v2(f, [
        (0x01, space_simple([2])), (0x03, dt_u32_be()),
        (0x08, layout_contiguous(f.append(u32raw), 8))])
    be = group_v2(f, {'f32arr': f32arr, 'f64scalar': f64s,
                      'i64scalar': i64s, 'u32arr': u32arr})
    finish_v2(f, group_v2(f, {'be': be}), path)


def make_bad_vax(path: Path):
    """VAX-order float dataset (byte-order bits 0 and 6 both set) —
    unsupported, must fail loudly rather than decode garbage."""
    f = FileBuf()
    f.alloc(48)

    def dt_f32_vax():
        return struct.pack('<B3sI2H4BI', 0x11, bytes([0x61, 0x1F, 0x00]), 4,
                           0, 32, 23, 8, 0, 23, 127)

    raw = f.append(struct.pack('<f', 1.0))
    ds = object_header_v2(f, [
        (0x01, space_scalar()), (0x03, dt_f32_vax()),
        (0x08, layout_contiguous(raw, 4))])
    finish_v2(f, group_v2(f, {'v': ds}), path)


def make_bad_stack(path: Path):
    """A chunk whose filter pipeline stacks TWO compressors (deflate then
    zstd) — legal HDF5, but the intermediate stream size between the
    stages is recorded nowhere in the file; the reader must reject the
    chain by name up front rather than mis-decode or fail cryptically."""
    f = FileBuf()
    f.alloc(48)
    _, img = f32_grid(4, 4)
    z = zlib.compress(img, 6)  # payload is irrelevant: the CHAIN is rejected
    addr = f.append(z)
    ds = object_header_v2(f, [
        (0x01, space_simple([4, 4])),
        (0x03, dt_f32()),
        (0x0B, filter_pipeline([(1, b'deflate', [6]),
                                (32015, b'zstd', [])])),
        (0x08, layout_v4_single(addr, [4, 4], filtered_size=len(z))),
    ])
    root = group_v2(f, {'stacked': ds})
    sb = bytearray()
    sb += bytes([0x89]) + b'HDF' + bytes([0x0D, 0x0A, 0x1A, 0x0A])
    sb += struct.pack('<4B', 3, 8, 8, 0)
    sb += struct.pack('<QQQQ', 0, UNDEF, len(f.buf), root)
    sb += struct.pack('<I', lookup3(bytes(sb)))
    f.write(0, bytes(sb))
    path.write_bytes(bytes(f.buf))


def make_bad_fletcher(path: Path):
    """A fletcher32-checksummed chunk whose stored checksum is corrupted —
    the reader must fail loudly (data corruption), never return data."""
    f = FileBuf()
    f.alloc(48)
    _, img = f32_grid(4, 4)
    flb = img + struct.pack('<I', fletcher32(img) ^ 0xDEAD)
    addr = f.append(flb)
    ds = object_header_v2(f, [
        (0x01, space_simple([4, 4])),
        (0x03, dt_f32()),
        (0x0B, filter_pipeline([(3, b'fletcher32', [])])),
        (0x08, layout_v4_single(addr, [4, 4], filtered_size=len(flb))),
    ])
    root = group_v2(f, {'bad': ds})
    sb = bytearray()
    sb += bytes([0x89]) + b'HDF' + bytes([0x0D, 0x0A, 0x1A, 0x0A])
    sb += struct.pack('<4B', 3, 8, 8, 0)
    sb += struct.pack('<QQQQ', 0, UNDEF, len(f.buf), root)
    sb += struct.pack('<I', lookup3(bytes(sb)))
    f.write(0, bytes(sb))
    path.write_bytes(bytes(f.buf))


# ----------------------------------------------- full-DAG pipeline tree ---
def make_pipeline_tree(outdir: Path):
    """A miniature measurement tree shaped like the reference's data_dir
    (<yyyy>/<ymd>/<ymd>_<batch>_<rep>/MOUSE_*.nxs, README.md:14-43): six
    repetition directories (2 batches x 3 repetitions, configuration 1)
    whose processed files carry every path the 15-step pipeline reads.
    Gaussian beams with known center/width; batch 1's sample beam transmits
    0.56, batch 2's (its background) 0.8, so the bg-corrected transmission
    is exactly 0.7 — same analytic anchors as the in-memory fixtures."""
    H = W = 32
    CY, CX, SIGMA, AMP = 16.0, 15.5, 3.0, 1000.0

    def gaussian(scale):
        out = []
        for y in range(H):
            for x in range(W):
                d2 = (y - CY) ** 2 + (x - CX) ** 2
                out.append(scale * AMP * math.exp(-d2 / (2 * SIGMA * SIGMA)))
        return b''.join(struct.pack('<f', v) for v in out)

    def write_rep(path: Path, sample_scale: float):
        f = FileBuf()
        f.alloc(48)

        def scalar_f64(value, units=None):
            raw = f.append(struct.pack('<d', value))
            msgs = [(0x01, space_scalar()), (0x03, dt_f64()),
                    (0x08, layout_contiguous(raw, 8))]
            if units:
                ub = units.encode() + b'\x00'
                msgs.append((0x0C, attr_v3('units', dt_str(len(ub)),
                                           space_scalar(), ub)))
            return object_header_v2(f, msgs)

        def image(scale):
            raw = gaussian(scale)
            addr = f.append(raw)
            return object_header_v2(f, [
                (0x01, space_simple([H, W])), (0x03, dt_f32()),
                (0x08, layout_contiguous(addr, len(raw)))])

        direct = group_v2(f, {'data': image(1.0),
                              'frame_time': scalar_f64(1.0, 's')})
        sample = group_v2(f, {'data': image(sample_scale),
                              'frame_time': scalar_f64(1.0, 's')})
        processing = group_v2(f, {'direct_beam_profile': direct,
                                  'sample_beam_profile': sample})
        det_tf = group_v2(f, {'det_x': scalar_f64(2.5, 'm')})
        det00 = group_v2(f, {'darkcurrent': scalar_f64(0.0),
                             'averaged_number_of_frames': scalar_f64(1.0),
                             'transformations': det_tf})
        instrument = group_v2(f, {'configuration': scalar_f64(1.0),
                                  'detector00': det00})
        beam = group_v2(f, {'incident_wavelength':
                            scalar_f64(1.54, 'angstrom')})
        smp_tf = group_v2(f, {'sample_x': scalar_f64(500.0, 'mm')})
        sample_grp = group_v2(f, {'beam': beam, 'transformations': smp_tf})
        entry1 = group_v2(f, {'instrument': instrument,
                              'processing': processing,
                              'sample': sample_grp})
        finish_v2(f, group_v2(f, {'entry1': entry1}), path)

    for batch, scale in ((1, 0.56), (2, 0.8)):
        for rep in (1, 2, 3):
            d = outdir / '2024' / '20240115' / f'20240115_{batch}_{rep}'
            d.mkdir(parents=True, exist_ok=True)
            write_rep(d / f'MOUSE_20240115_{batch}_{rep}.nxs', scale)


# ------------------------------------------------- virtual dataset (VDS) --
def sel_all():
    """Serialized H5S_SEL_ALL: type 3, version 1, 8 reserved bytes."""
    return struct.pack('<II', 3, 1) + bytes(8)


def sel_hyper_v1_multi(blocks):
    """Version-1 hyperslab block list: u32 (start corner, opposite corner)
    coordinate pairs, block-major."""
    rank = len(blocks[0][0])
    info = struct.pack('<II', rank, len(blocks))
    for start, end in blocks:
        info += b''.join(struct.pack('<I', s) for s in start)
        info += b''.join(struct.pack('<I', e) for e in end)
    return struct.pack('<IIII', 2, 1, 0, len(info)) + info


def sel_hyper_v1(start, end):
    """Version-1 hyperslab selection: ONE block, u32 start/end corners."""
    return sel_hyper_v1_multi([(start, end)])


def sel_points(points):
    """Version-1 point selection: u32 coordinates, point-major, iterated
    in stored order."""
    rank = len(points[0])
    info = struct.pack('<II', rank, len(points))
    for p in points:
        info += b''.join(struct.pack('<I', c) for c in p)
    return struct.pack('<IIII', 1, 1, 0, len(info)) + info


def sel_points_v2(points, enc=2):
    """Version-2 point selection (HDF5 1.12+, H5S__point_serialize):
    type, version, u8 encode size, u32 rank, then num points and
    point-major coordinates at the encode width."""
    rank = len(points[0])
    body = struct.pack('<IIB', 1, 2, enc) + struct.pack('<I', rank)
    body += len(points).to_bytes(enc, 'little')
    for p in points:
        for c in p:
            body += c.to_bytes(enc, 'little')
    return body


def sel_hyper_v2(start, stride, count, block):
    """Version-2 regular hyperslab: u64 coordinates INTERLEAVED per
    dimension (Start #1, Stride #1, Count #1, Block #1, ... Start #n),
    matching libhdf5's H5S__hyper_serialize / the format spec."""
    rank = len(start)
    info = struct.pack('<I', rank)
    for d in range(rank):
        for arr in (start, stride, count, block):
            info += struct.pack('<Q', arr[d])
    return struct.pack('<II', 2, 2) + struct.pack('<B', 1) + \
        struct.pack('<I', len(info)) + info


def sel_hyper_v3(start, stride, count, block, enc=4):
    """Version-3 regular hyperslab (HDF5 1.12+): flags bit0 set, variable
    coordinate width, per-dimension interleaved like v2."""
    rank = len(start)
    body = struct.pack('<IIBB', 2, 3, 1, enc) + struct.pack('<I', rank)
    for d in range(rank):
        for arr in (start, stride, count, block):
            body += arr[d].to_bytes(enc, 'little')
    return body


def vds_heap_block(entries):
    """Virtual storage global heap block: version, num entries, then
    (source file, source dataset, source selection, virtual selection)
    per entry, then a lookup3 checksum."""
    body = struct.pack('<B', 0) + struct.pack('<Q', len(entries))
    for fname, dspath, src_sel, virt_sel in entries:
        body += fname.encode() + b'\0' + dspath.encode() + b'\0'
        body += src_sel + virt_sel
    return body + struct.pack('<I', lookup3(body))


def layout_virtual(heap_addr, heap_index):
    return struct.pack('<BBQI', 4, 3, heap_addr, heap_index)


def make_vds(outdir: Path):
    """Eiger-shaped VDS fixtures: vds_master.h5's /entry/vframes [4,3] maps
    two sibling source files into contiguous row slabs (one virtual
    selection encoded as a v2 regular hyperslab, one as a v1 single-block
    list, both source selections ALL); /entry/vpartial has one resolvable
    and one missing source (missing rows = fill + attr); /entry/vnone's
    only source is missing (marker semantics: no data)."""
    outdir.mkdir(parents=True, exist_ok=True)

    def write_source(name, base):
        f = FileBuf()
        f.alloc(48)
        raw = b''.join(struct.pack('<f', base + i) for i in range(6))
        ds = object_header_v2(f, [
            (0x01, space_simple([2, 3])),
            (0x03, dt_f32()),
            (0x08, layout_contiguous(f.append(raw), len(raw))),
        ])
        finish_v2(f, group_v2(f, {'data': ds}), outdir / name)

    write_source('vds_data_000001.h5', 0.0)
    write_source('vds_data_000002.h5', 100.0)
    # 0-based printf sources (%b starts at block 0)
    write_source('vds_blk_000000.h5', 0.0)
    write_source('vds_blk_000001.h5', 100.0)
    # literal percent in an on-disk source name ('%%' escape target)
    write_source('vds%lit.h5', 200.0)
    # literal '%d' name on disk: the literal file is what libhdf5 would
    # read, so it must take PRIORITY over substitution — scan0_a.h5 is a
    # deliberate DECOY that a substitute-first reader would wrongly pick
    write_source('scan%d_a.h5', 300.0)
    write_source('scan0_a.h5', 999.0)
    # a %d-spelled printf FAMILY that really exists (detector naming)
    write_source('vds_det_0.h5', 0.0)
    write_source('vds_det_1.h5', 100.0)

    f = FileBuf()
    f.alloc(48)
    gh = GlobalHeap(f)
    i_frames = gh.add(vds_heap_block([
        # count>1 along dim 0 (2 adjacent 1-row blocks, stride==block) —
        # same [2,3] slab as a single block, but exercises the count>1
        # decode path at rank 2 where grouped-vs-interleaved coordinate
        # order actually differs
        ('vds_data_000001.h5', '/data', sel_all(),
         sel_hyper_v2([0, 0], [1, 1], [2, 1], [1, 3])),
        ('vds_data_000002.h5', '/data', sel_all(),
         sel_hyper_v1([2, 0], [3, 2])),
    ]))
    i_partial = gh.add(vds_heap_block([
        # v3-encoded virtual selection (2-byte coords) — HDF5 1.12+ form
        ('vds_data_000001.h5', '/data', sel_all(),
         sel_hyper_v3([0, 0], [1, 1], [1, 1], [2, 3], enc=2)),
        ('vds_missing.h5', '/data', sel_all(),
         sel_hyper_v1([2, 0], [3, 2])),
    ]))
    i_none = gh.add(vds_heap_block([
        ('vds_missing.h5', '/data', sel_all(), sel_all()),
    ]))
    # oversized: 2^40 f32 elements — must degrade to a marker, not throw,
    # even though its source resolves
    i_huge = gh.add(vds_heap_block([
        ('vds_data_000001.h5', '/data', sel_all(),
         sel_hyper_v1([0, 0, 0], [1, 1, 5])),
    ]))
    UNLIM = (1 << 64) - 1
    # printf-style open-ended mapping (H5Pset_virtual %b form): 2-row
    # blocks along dim 0, count H5S_UNLIMITED; block k reads
    # vds_blk_00000k.h5 (0-based). The [6,3] extent holds 3 blocks but
    # only blocks 0 and 1 exist -> short stack: rows 4-5 fill, first
    # missing source surfaced.
    i_printf = gh.add(vds_heap_block([
        ('vds_blk_%06b.h5', '/data', sel_all(),
         sel_hyper_v2([0, 0], [2, 1], [UNLIM, 1], [2, 3])),
    ]))
    # same printf mapping fully satisfied by the available sources
    i_printf_full = gh.add(vds_heap_block([
        ('vds_blk_%06b.h5', '/data', sel_all(),
         sel_hyper_v2([0, 0], [2, 1], [UNLIM, 1], [2, 3])),
    ]))
    # non-printf unlimited mapping: ONE concrete source feeding an
    # open-ended virtual extent — the resolved source extent (2 rows)
    # decides the block count, rest of [4,3] reads fill
    i_grow = gh.add(vds_heap_block([
        ('vds_data_000001.h5', '/data', sel_all(),
         sel_hyper_v2([0, 0], [1, 1], [UNLIM, 1], [1, 3])),
    ]))
    # 2-module interleave: STRIDED virtual selections (stride > block) —
    # source 1 feeds rows 0,2; source 2 feeds rows 1,3. Dim 1 keeps the
    # libhdf5 DEFAULT stride 1 under a 3-wide block (stride is
    # meaningless at count 1 — real files look like this)
    i_ilv = gh.add(vds_heap_block([
        ('vds_data_000001.h5', '/data', sel_all(),
         sel_hyper_v2([0, 0], [2, 1], [2, 1], [1, 3])),
        ('vds_data_000002.h5', '/data', sel_all(),
         sel_hyper_v2([1, 0], [2, 1], [2, 1], [1, 3])),
    ]))
    # multi-block v1 list: rows 0 and 2 of [4,3] from one source, two
    # dim-0-stacked blocks in one selection
    i_multi = gh.add(vds_heap_block([
        ('vds_data_000001.h5', '/data', sel_all(),
         sel_hyper_v1_multi([([0, 0], [0, 2]), ([2, 0], [2, 2])])),
    ]))
    # point selection: 6 explicit coordinates in stored order
    i_points = gh.add(vds_heap_block([
        ('vds_data_000001.h5', '/data', sel_all(),
         sel_points([(0, 0), (0, 1), (1, 2), (2, 0), (3, 1), (3, 2)])),
    ]))
    # same scatter, VERSION-2 encoding (HDF5 1.12+, 2-byte coords)
    i_points2 = gh.add(vds_heap_block([
        ('vds_data_000001.h5', '/data', sel_all(),
         sel_points_v2([(0, 0), (0, 1), (1, 2), (2, 0), (3, 1), (3, 2)],
                       enc=2)),
    ]))
    # literal-% names with FIXED selections: '%%' unescapes to a literal
    # percent and resolves; a stray %d-looking name resolves literally and
    # degrades to a missing marker — neither is a printf mapping
    i_escape = gh.add(vds_heap_block([
        ('vds%%lit.h5', '/data', sel_all(), sel_hyper_v1([0, 0], [1, 2])),
        ('scan%day.h5', '/data', sel_all(), sel_hyper_v1([2, 0], [3, 2])),
    ]))
    # IRREGULAR multi-block union: rows 0-1 cols 0-1 plus rows 0-1 col 2 —
    # element order must be global row-major (merge by offset), which
    # interleaves the two stored blocks within each row
    i_irr = gh.add(vds_heap_block([
        ('vds_data_000001.h5', '/data', sel_all(),
         sel_hyper_v1_multi([([0, 0], [1, 1]), ([0, 2], [1, 2])])),
    ]))
    # block-unlimited selection (count 1, block H5S_UNLIMITED along dim 0):
    # one open-ended block clamped by the resolved source extent
    i_blkunlim = gh.add(vds_heap_block([
        ('vds_data_000001.h5', '/data', sel_all(),
         sel_hyper_v2([0, 0], [1, 1], [1, 1], [UNLIM, 3])),
    ]))
    # literal '%d' + unlimited selection: substituted block 0 is missing,
    # so the reader falls back to the literal name (which exists) — the
    # %d-mis-trigger case where fabricated names must not win
    i_dlit = gh.add(vds_heap_block([
        ('scan%d_a.h5', '/data', sel_all(),
         sel_hyper_v2([0, 0], [1, 1], [UNLIM, 1], [1, 3])),
    ]))
    # %d printf family that exists: blocks 0,1 resolve, block 2 missing
    i_dfam = gh.add(vds_heap_block([
        ('vds_det_%d.h5', '/data', sel_all(),
         sel_hyper_v2([0, 0], [2, 1], [UNLIM, 1], [2, 3])),
    ]))
    heap_addr = gh.flush()

    vframes = object_header_v2(f, [
        (0x01, space_simple([4, 3])),
        (0x03, dt_f32()),
        (0x08, layout_virtual(heap_addr, i_frames)),
    ])
    vpartial = object_header_v2(f, [
        (0x01, space_simple([4, 3])),
        (0x03, dt_f32()),
        (0x08, layout_virtual(heap_addr, i_partial)),
    ])
    vnone = object_header_v2(f, [
        (0x01, space_simple([4, 3])),
        (0x03, dt_f32()),
        (0x08, layout_virtual(heap_addr, i_none)),
    ])
    vhuge = object_header_v2(f, [
        (0x01, space_simple([1 << 20, 1 << 10, 1 << 10])),
        (0x03, dt_f32()),
        (0x08, layout_virtual(heap_addr, i_huge)),
    ])
    vprintf = object_header_v2(f, [
        (0x01, space_simple([6, 3])),
        (0x03, dt_f32()),
        (0x08, layout_virtual(heap_addr, i_printf)),
    ])
    vprintf_full = object_header_v2(f, [
        (0x01, space_simple([4, 3])),
        (0x03, dt_f32()),
        (0x08, layout_virtual(heap_addr, i_printf_full)),
    ])
    vgrow = object_header_v2(f, [
        (0x01, space_simple([4, 3])),
        (0x03, dt_f32()),
        (0x08, layout_virtual(heap_addr, i_grow)),
    ])
    vinterleave = object_header_v2(f, [
        (0x01, space_simple([4, 3])),
        (0x03, dt_f32()),
        (0x08, layout_virtual(heap_addr, i_ilv)),
    ])
    vmulti = object_header_v2(f, [
        (0x01, space_simple([4, 3])),
        (0x03, dt_f32()),
        (0x08, layout_virtual(heap_addr, i_multi)),
    ])
    vpoints = object_header_v2(f, [
        (0x01, space_simple([4, 3])),
        (0x03, dt_f32()),
        (0x08, layout_virtual(heap_addr, i_points)),
    ])
    vescape = object_header_v2(f, [
        (0x01, space_simple([4, 3])),
        (0x03, dt_f32()),
        (0x08, layout_virtual(heap_addr, i_escape)),
    ])
    virregular = object_header_v2(f, [
        (0x01, space_simple([4, 3])),
        (0x03, dt_f32()),
        (0x08, layout_virtual(heap_addr, i_irr)),
    ])
    vblockunlim = object_header_v2(f, [
        (0x01, space_simple([4, 3])),
        (0x03, dt_f32()),
        (0x08, layout_virtual(heap_addr, i_blkunlim)),
    ])
    vdlit = object_header_v2(f, [
        (0x01, space_simple([4, 3])),
        (0x03, dt_f32()),
        (0x08, layout_virtual(heap_addr, i_dlit)),
    ])
    vdfam = object_header_v2(f, [
        (0x01, space_simple([6, 3])),
        (0x03, dt_f32()),
        (0x08, layout_virtual(heap_addr, i_dfam)),
    ])
    vpoints2 = object_header_v2(f, [
        (0x01, space_simple([4, 3])),
        (0x03, dt_f32()),
        (0x08, layout_virtual(heap_addr, i_points2)),
    ])
    entry = group_v2(f, {'vframes': vframes, 'vpartial': vpartial,
                         'vnone': vnone, 'vhuge': vhuge,
                         'vprintf': vprintf, 'vprintf_full': vprintf_full,
                         'vgrow': vgrow, 'vinterleave': vinterleave,
                         'vmulti': vmulti, 'vpoints': vpoints,
                         'vescape': vescape, 'virregular': virregular,
                         'vblockunlim': vblockunlim, 'vdlit': vdlit,
                         'vdfam': vdfam, 'vpoints2': vpoints2})
    finish_v2(f, group_v2(f, {'entry': entry}), outdir / 'vds_master.h5')

    # OVERLAPPING multi-block union (malformed: libhdf5 normalizes unions
    # to disjoint blocks before serializing) — the reader must reject it
    # loudly during validation rather than risk a wrong element order.
    # Separate master so the rejection cannot abort the main fixtures.
    fo = FileBuf()
    fo.alloc(48)
    gho = GlobalHeap(fo)
    i_ovl = gho.add(vds_heap_block([
        ('vds_data_000001.h5', '/data', sel_all(),
         sel_hyper_v1_multi([([0, 0], [1, 1]), ([1, 1], [2, 2])])),
    ]))
    heap_o = gho.flush()
    dso = object_header_v2(fo, [
        (0x01, space_simple([4, 3])),
        (0x03, dt_f32()),
        (0x08, layout_virtual(heap_o, i_ovl)),
    ])
    finish_v2(fo, group_v2(fo, {'voverlap': dso}),
              outdir / 'vds_overlap_master.h5')

    # vlen-string VIRTUAL dataset: its elements would be global-heap
    # REFERENCES copied across files — the reader must reject it loudly.
    # Separate master so the rejection does not abort the main fixtures.
    fv = FileBuf()
    fv.alloc(48)
    ghv = GlobalHeap(fv)
    i_vlen = ghv.add(vds_heap_block([
        ('vds_data_000001.h5', '/data', sel_all(), sel_all()),
    ]))
    heap_v = ghv.flush()
    dsv = object_header_v2(fv, [
        (0x01, space_simple([4])),
        (0x03, dt_vlen_str()),
        (0x08, layout_virtual(heap_v, i_vlen)),
    ])
    finish_v2(fv, group_v2(fv, {'vstr': dsv}), outdir / 'vds_vlen_master.h5')


def make_swizzle(path: Path):
    """Extensible-array chunk indexes whose UNLIMITED dimension is dim 1
    (not dim 0): libhdf5 swizzles chunk coordinates so the unlimited dim
    is slowest-varying before linearizing (H5VM_swizzle_coords). swz has
    a 1x3 chunk grid (the linear order happens to match row-major — the
    placement itself is what's checked); swz2 has a 2x3 grid whose
    swizzled linear order genuinely differs from row-major enumeration,
    so a reader without the swizzle scrambles chunk placement."""
    f = FileBuf()
    f.alloc(48)

    def space_unlim1(dims):
        # maxdims stored, dim 1 unlimited
        body = struct.pack('<4B4x', 1, len(dims), 1, 0)
        body += b''.join(struct.pack('<Q', d) for d in dims)
        body += struct.pack('<QQ', dims[0], UNDEF)
        return body

    # swz: [4,6] f32, chunk [4,2] -> grid 1x3; swizzled grid (3,1) walks
    # the same 0,1,2 order; chunk i holds values i*8 + r*2 + cc row-major
    entries = []
    for i in range(3):
        chunk = b''.join(struct.pack('<f', float(i * 8 + r * 2 + cc))
                         for r in range(4) for cc in range(2))
        entries.append((f.append(chunk), 32, 0))
    swz = object_header_v2(f, [
        (0x01, space_unlim1([4, 6])),
        (0x03, dt_f32()),
        (0x08, layout_v4_ext_array(ext_array(f, entries, filtered=False),
                                   [4, 2])),
    ])

    # swz2: [4,6] f32, chunk [2,2] -> grid 2x3; array element i holds the
    # chunk at swizzled coords (col_chunk, row_chunk) = (i // 2, i % 2)
    vals, _ = f32_grid(4, 6)
    entries2 = []
    for i in range(6):
        cc, rc = i // 2, i % 2
        chunk = b''.join(struct.pack('<f', vals[r * 6 + c])
                         for r in range(rc * 2, rc * 2 + 2)
                         for c in range(cc * 2, cc * 2 + 2))
        entries2.append((f.append(chunk), 16, 0))
    swz2 = object_header_v2(f, [
        (0x01, space_unlim1([4, 6])),
        (0x03, dt_f32()),
        (0x08, layout_v4_ext_array(ext_array(f, entries2, filtered=False),
                                   [2, 2])),
    ])
    finish_v2(f, group_v2(f, {'swz': swz, 'swz2': swz2}), path)


def make_objref(path: Path):
    """Scalar object references (datatype class 7, rtype 0): /refs/to_ds
    and /refs/to_grp resolve to the referenced object's PATH, a zero
    address reads as '' (null reference, h5py's None), and an address
    that is no visited object header surfaces the unresolved_object_ref
    marker. The reference-typed ATTRIBUTE on the target must be SKIPPED
    (opaque metadata), never abort the read."""
    f = FileBuf()
    f.alloc(48)
    t_raw = f.append(struct.pack('<d', 42.0))
    target = object_header_v2(f, [
        (0x01, space_scalar()),
        (0x03, dt_f64()),
        (0x08, layout_contiguous(t_raw, 8)),
        (0x0C, attr_v3('refattr', dt_objref(), space_scalar(),
                       struct.pack('<Q', 0))),
    ])
    grp = group_v2(f, {'target': target})

    def ref_ds(addr):
        raw = f.append(struct.pack('<Q', addr))
        return object_header_v2(f, [
            (0x01, space_scalar()),
            (0x03, dt_objref()),
            (0x08, layout_contiguous(raw, 8)),
        ])

    # decoy: a plain dataset whose ordinary USER attribute is literally
    # named 'object_ref_addr' and holds a plausible address string — the
    # resolver keeps pending references in a dedicated Node field, so this
    # must read through untouched (value 7.0, attribute preserved), never
    # be mistaken for a pending reference
    d_raw = f.append(struct.pack('<d', 7.0))
    addr_s = (str(target) + '\x00').encode()
    decoy = object_header_v2(f, [
        (0x01, space_scalar()),
        (0x03, dt_f64()),
        (0x08, layout_contiguous(d_raw, 8)),
        (0x0C, attr_v3('object_ref_addr', dt_str(len(addr_s)),
                       space_scalar(), addr_s)),
    ])

    refs = group_v2(f, {
        'to_ds': ref_ds(target),
        'to_grp': ref_ds(grp),
        'to_null': ref_ds(0),
        'to_nowhere': ref_ds(t_raw),  # raw-data bytes, not an object header
        'decoy': decoy,
    })
    finish_v2(f, group_v2(f, {'grp': grp, 'refs': refs}), path)


def make_bad_refmarker(path: Path):
    """A DANGLING scalar object reference whose dataset also carries a
    genuine user attribute named 'unresolved_object_ref' — the name the
    resolver uses for its dangling-reference marker. Writing the marker
    would silently overwrite the user's value, so the reader must fail
    loudly instead."""
    f = FileBuf()
    f.alloc(48)
    decoy_raw = f.append(struct.pack('<d', 9.0))
    raw = f.append(struct.pack('<Q', decoy_raw))  # not an object header
    mark = b'mine\x00'
    ds = object_header_v2(f, [
        (0x01, space_scalar()),
        (0x03, dt_objref()),
        (0x08, layout_contiguous(raw, 8)),
        (0x0C, attr_v3('unresolved_object_ref', dt_str(len(mark)),
                       space_scalar(), mark)),
    ])
    finish_v2(f, group_v2(f, {'clash': ds}), path)


def _ref2_elem(addr, idx, rtype=2, flags=0, blob_size=9):
    """18-byte disk element of a revised (HDF5 1.12 H5T_STD_REF) reference:
    2-byte encode header (ref type, flags) + 4-byte blob size + global-heap
    blob ID (8-byte GCOL address + 4-byte index) — libhdf5
    H5T__ref_disk_write's layout."""
    return struct.pack('<BBIQI', rtype, flags, blob_size, addr, idx)


def make_objref2(path: Path):
    """Revised object references (rtype 2, the HDF5 1.12+ H5T_STD_REF
    default): the heap blob is token size (1 byte, = 8 for the native
    VOL) + the little-endian object-header address
    (H5R__encode_obj_token). /refs/to_ds and /refs/to_grp resolve to the
    referenced object's PATH like rtype 0; an all-zero element (zero ref
    type byte — H5T__ref_disk_isnull's test) and a typed element with a
    zero blob ID both read as '' (null reference); a dangling heap index
    surfaces the unresolved_object_ref marker."""
    f = FileBuf()
    f.alloc(48)
    t_raw = f.append(struct.pack('<d', 43.0))
    target = object_header_v2(f, [
        (0x01, space_scalar()),
        (0x03, dt_f64()),
        (0x08, layout_contiguous(t_raw, 8)),
    ])
    grp = group_v2(f, {'target': target})
    gh = GlobalHeap(f)
    i_ds = gh.add(bytes([8]) + struct.pack('<Q', target))
    i_grp = gh.add(bytes([8]) + struct.pack('<Q', grp))
    heap = gh.flush()

    def ref_ds(elem):
        raw = f.append(elem)
        return object_header_v2(f, [
            (0x01, space_scalar()),
            (0x03, dt_objref(rtype=2, size=18)),
            (0x08, layout_contiguous(raw, 18)),
        ])

    refs = group_v2(f, {
        'to_ds': ref_ds(_ref2_elem(heap, i_ds)),
        'to_grp': ref_ds(_ref2_elem(heap, i_grp)),
        'to_null': ref_ds(b'\x00' * 18),
        'to_null_blob': ref_ds(_ref2_elem(0, 0)),
        'dangling': ref_ds(_ref2_elem(heap, 99)),
    })
    finish_v2(f, group_v2(f, {'grp': grp, 'refs': refs}), path)


def make_bad_objref2(path: Path, kind):
    """Loud-fail corners of the revised reference form: 'external' (flags
    bit 0 — the blob embeds a foreign filename, unresolvable from this
    file), 'token' (a non-8-byte token: not the native VOL address form),
    'attrname' (rtype 4 whose blob's 2-byte name length disagrees with
    the bytes that follow — a layout misread must stay loud)."""
    f = FileBuf()
    f.alloc(48)
    gh = GlobalHeap(f)
    if kind == 'external':
        idx = gh.add(bytes([8]) + struct.pack('<Q', 0x1234))
        elem, dt = _ref2_elem(gh.flush(), idx, flags=1), \
            dt_objref(rtype=2, size=18)
    elif kind == 'attrname':
        blob = bytes([8]) + struct.pack('<Q', 0x1234) + \
            struct.pack('<H', 10) + b'abc'  # claims 10, carries 3
        idx = gh.add(blob)
        elem, dt = _ref2_elem(gh.flush(), idx, rtype=4,
                              blob_size=len(blob)), \
            dt_objref(rtype=4, size=18)
    else:  # token
        idx = gh.add(bytes([4]) + struct.pack('<I', 7))
        elem, dt = _ref2_elem(gh.flush(), idx, blob_size=5), \
            dt_objref(rtype=2, size=18)
    ds = object_header_v2(f, [
        (0x01, space_scalar()),
        (0x03, dt),
        (0x08, layout_contiguous(f.append(elem), 18)),
    ])
    finish_v2(f, group_v2(f, {'r': ds}), path)


def make_attrref4(path: Path):
    """Revised attribute references (rtype 4, HDF5 1.12 H5R_ATTR): same
    18-byte disk element; the heap blob nests the token part (1-byte
    size + 8-byte LE address) then the name part (H5R__encode_string:
    2-byte LE length + the name bytes). /refs/to_attr resolves to the
    OWNING object's path with `referenced_attribute` = the name (the
    attribute's value reads through the owner's normal walk); null
    element / null blob ID read as ''; a dangling heap index surfaces
    the unresolved_attr_ref marker."""
    f = FileBuf()
    f.alloc(48)
    t_raw = f.append(struct.pack('<d', 44.0))
    target = object_header_v2(f, [
        (0x01, space_scalar()),
        (0x03, dt_f64()),
        (0x08, layout_contiguous(t_raw, 8)),
        (0x0C, attr_v3('units', dt_str(2), space_scalar(), b'm\x00')),
    ])
    grp = group_v2(f, {'target': target})
    gh = GlobalHeap(f)
    name = b'units'
    blob = bytes([8]) + struct.pack('<Q', target) + \
        struct.pack('<H', len(name)) + name
    i_attr = gh.add(blob)
    heap = gh.flush()

    def ref_ds(elem):
        raw = f.append(elem)
        return object_header_v2(f, [
            (0x01, space_scalar()),
            (0x03, dt_objref(rtype=4, size=18)),
            (0x08, layout_contiguous(raw, 18)),
        ])

    refs = group_v2(f, {
        'to_attr': ref_ds(_ref2_elem(heap, i_attr, rtype=4,
                                     blob_size=len(blob))),
        'to_null': ref_ds(b'\x00' * 18),
        'to_null_blob': ref_ds(_ref2_elem(0, 0, rtype=4)),
        'dangling': ref_ds(_ref2_elem(heap, 99, rtype=4, blob_size=1)),
    })
    finish_v2(f, group_v2(f, {'grp': grp, 'refs': refs}), path)


def _ref2_region_blob(addr, sel):
    """Heap blob of a REVISED dataset-region reference (rtype 3,
    H5R_DATASET_REGION2): the encoded reference minus its 2-byte header —
    token part (1-byte size + 8-byte LE object-header address,
    H5R__encode_obj_token) then region part (H5R__encode_region): 4-byte
    LE serialized-selection size + 4-byte LE extent rank + the standard
    H5S selection serialization (the same bytes the ≤1.10 rtype-1 heap
    object carries after its address)."""
    rank = 2
    return (bytes([8]) + struct.pack('<Q', addr) +
            struct.pack('<II', len(sel), rank) + sel)


def make_regionref2(path: Path):
    """Revised dataset-region references (rtype 3, HDF5 1.12
    H5R_DATASET_REGION2): same 18-byte disk element as rtype 2; the heap
    blob nests the token then the serialized selection. Reads like
    rtype 1: target PATH + `region_selection` rendering; null element /
    null blob ID read as ''; a dangling heap index surfaces the
    unresolved_region_ref marker."""
    f = FileBuf()
    f.alloc(48)
    t_raw = f.append(struct.pack('<24d', *range(24)))
    target = object_header_v2(f, [
        (0x01, space_simple([4, 6])),
        (0x03, dt_f64()),
        (0x08, layout_contiguous(t_raw, 24 * 8)),
    ])
    grp = group_v2(f, {'image': target})

    gh = GlobalHeap(f)
    # rows 1:3, cols 2:5 (inclusive ends 2, 4 on disk) — the same
    # selection the rtype-1 fixture pins, so the two forms must render
    # the identical region_selection string
    i_block = gh.add(_ref2_region_blob(
        target, _sel_block_v1(2, [((1, 2), (2, 4))])))
    i_union = gh.add(_ref2_region_blob(
        target, _sel_block_v1(2, [((0, 0), (0, 1)), ((3, 4), (3, 5))])))
    i_points = gh.add(_ref2_region_blob(
        target, _sel_points_v1(2, [(0, 0), (1, 3), (3, 5)])))
    i_all = gh.add(_ref2_region_blob(target, _sel_all()))
    heap = gh.flush()
    blob_sizes = {
        i_block: 9 + 8 + len(_sel_block_v1(2, [((1, 2), (2, 4))])),
        i_union: 9 + 8 + len(_sel_block_v1(2, [((0, 0), (0, 1)),
                                               ((3, 4), (3, 5))])),
        i_points: 9 + 8 + len(_sel_points_v1(2, [(0, 0), (1, 3), (3, 5)])),
        i_all: 9 + 8 + len(_sel_all()),
    }

    def ref_ds(elem):
        raw = f.append(elem)
        return object_header_v2(f, [
            (0x01, space_scalar()),
            (0x03, dt_objref(rtype=3, size=18)),
            (0x08, layout_contiguous(raw, 18)),
        ])

    def elem(idx):
        return _ref2_elem(heap, idx, rtype=3, blob_size=blob_sizes[idx])

    refs = group_v2(f, {
        'to_block': ref_ds(elem(i_block)),
        'to_union': ref_ds(elem(i_union)),
        'to_points': ref_ds(elem(i_points)),
        'to_all': ref_ds(elem(i_all)),
        'to_null': ref_ds(b'\x00' * 18),
        'to_null_blob': ref_ds(_ref2_elem(0, 0, rtype=3)),
        'dangling': ref_ds(_ref2_elem(heap, 99, rtype=3, blob_size=1)),
    })
    finish_v2(f, group_v2(f, {'grp': grp, 'refs': refs}), path)


def _sel_block_v1(rank, blocks):
    """Serialized hyperslab block-list selection, v1 encoding (u32 coords,
    INCLUSIVE end corners — libhdf5 H5S__hyper_serialize pre-1.12)."""
    body = struct.pack('<II', rank, len(blocks))
    for start, end in blocks:
        body += b''.join(struct.pack('<I', c) for c in start)
        body += b''.join(struct.pack('<I', c) for c in end)
    return struct.pack('<IIII', 2, 1, 0, len(body)) + body


def _sel_points_v1(rank, points):
    body = struct.pack('<II', rank, len(points))
    for p in points:
        body += b''.join(struct.pack('<I', c) for c in p)
    return struct.pack('<IIII', 1, 1, 0, len(body)) + body


def _sel_all():
    return struct.pack('<II8x', 3, 1)


def make_regionref(path: Path):
    """Dataset-region references (rtype 1, the ≤1.10 12-byte heap form):
    each value is (GCOL address, index) and the heap object is the
    target's object-header address + a serialized dataspace selection.
    The reader resolves the target PATH (like object refs) and renders
    the selection into the `region_selection` attribute: single-block
    hyperslabs as half-open `start:end` per dim, multi-block unions
    `;`-joined, point selections as `points:N`, ALL as `all`. A zero
    handle is a null reference (''); a handle whose index is absent from
    the collection surfaces the unresolved_region_ref marker."""
    f = FileBuf()
    f.alloc(48)
    t_raw = f.append(struct.pack('<24d', *range(24)))
    target = object_header_v2(f, [
        (0x01, space_simple([4, 6])),
        (0x03, dt_f64()),
        (0x08, layout_contiguous(t_raw, 24 * 8)),
        # region-reference-typed ATTRIBUTE: opaque metadata, must be
        # skipped (same policy as object-reference attrs), never abort
        (0x0C, attr_v3('roi_ref', dt_objref(rtype=1, size=12),
                       space_scalar(), struct.pack('<QI', 0, 0))),
    ])
    grp = group_v2(f, {'image': target})

    gh = GlobalHeap(f)
    # rows 1:3, cols 2:5 of the 4x6 image (inclusive ends 2, 4 on disk)
    i_block = gh.add(struct.pack('<Q', target) +
                     _sel_block_v1(2, [((1, 2), (2, 4))]))
    i_union = gh.add(struct.pack('<Q', target) +
                     _sel_block_v1(2, [((0, 0), (0, 1)), ((3, 4), (3, 5))]))
    i_points = gh.add(struct.pack('<Q', target) +
                      _sel_points_v1(2, [(0, 0), (1, 3), (3, 5)]))
    i_all = gh.add(struct.pack('<Q', target) + _sel_all())
    heap = gh.flush()

    def ref_ds(addr, idx):
        raw = f.append(struct.pack('<QI', addr, idx))
        return object_header_v2(f, [
            (0x01, space_scalar()),
            (0x03, dt_objref(rtype=1, size=12)),
            (0x08, layout_contiguous(raw, 12)),
        ])

    refs = group_v2(f, {
        'to_block': ref_ds(heap, i_block),
        'to_union': ref_ds(heap, i_union),
        'to_points': ref_ds(heap, i_points),
        'to_all': ref_ds(heap, i_all),
        'to_null': ref_ds(0, 0),
        'dangling': ref_ds(heap, 99),  # collection exists, index absent
    })
    finish_v2(f, group_v2(f, {'grp': grp, 'refs': refs}), path)


def make_bad_regionref(path: Path):
    """A region reference whose heap object is too short to hold the
    8-byte target address — truncated metadata must fail loudly, never
    decode garbage as an address."""
    f = FileBuf()
    f.alloc(48)
    gh = GlobalHeap(f)
    idx = gh.add(b'\x01\x02\x03\x04')  # 4 bytes < the 8-byte address
    heap = gh.flush()
    raw = f.append(struct.pack('<QI', heap, idx))
    ds = object_header_v2(f, [
        (0x01, space_scalar()),
        (0x03, dt_objref(rtype=1, size=12)),
        (0x08, layout_contiguous(raw, 12)),
    ])
    finish_v2(f, group_v2(f, {'region': ds}), path)


def make_bad_refarray(path: Path):
    """An object-reference ARRAY dataset — scalar-only policy (same as
    strings): keeping element 0 silently would be an undetectable partial
    read, so it must fail loudly."""
    f = FileBuf()
    f.alloc(48)
    raw = f.append(struct.pack('<3Q', 0, 0, 0))
    ds = object_header_v2(f, [
        (0x01, space_simple([3])),
        (0x03, dt_objref()),
        (0x08, layout_contiguous(raw, 24)),
    ])
    finish_v2(f, group_v2(f, {'refarr': ds}), path)


def make_bad_refcompound(path: Path):
    """A compound dataset with an object-reference member (class 7) —
    references resolve against the walk's address map, which compound
    decoding does not thread through; must fail loudly with the policy
    message, never an internal invariant error."""
    f = FileBuf()
    f.alloc(48)

    def member_v3(name, offset, dt, off_bytes):
        return name.encode() + b'\x00' + \
            offset.to_bytes(off_bytes, 'little') + dt

    def dt_compound(version, size, members_enc):
        return struct.pack('<BBBBI', (version << 4) | 6,
                           len(members_enc) & 0xFF,
                           (len(members_enc) >> 8) & 0xFF, 0, size) + \
            b''.join(members_enc)

    raw = f.append(struct.pack('<dQ', 1.0, 0))
    ds = object_header_v2(f, [
        (0x01, space_scalar()),
        (0x03, dt_compound(3, 16, [
            member_v3('x', 0, dt_f64(), 1),
            member_v3('ref', 8, dt_objref(), 1),
        ])),
        (0x08, layout_contiguous(raw, 16)),
    ])
    finish_v2(f, group_v2(f, {'table': ds}), path)


def make_str_array(path: Path):
    """A fixed-string ARRAY dataset — unsupported, must fail loudly rather
    than silently truncate to the first element."""
    f = FileBuf()
    f.alloc(48)
    raw = f.append(b'aaa\x00bbb\x00ccc\x00')
    ds = object_header_v2(f, [
        (0x01, space_simple([3])),
        (0x03, dt_str(4)),
        (0x08, layout_contiguous(raw, 12)),
    ])
    root = group_v2(f, {'names': ds})
    sb = bytearray()
    sb += bytes([0x89]) + b'HDF' + bytes([0x0D, 0x0A, 0x1A, 0x0A])
    sb += struct.pack('<4B', 3, 8, 8, 0)
    sb += struct.pack('<QQQQ', 0, UNDEF, len(f.buf), root)
    sb += struct.pack('<I', lookup3(bytes(sb)))
    f.write(0, bytes(sb))
    path.write_bytes(bytes(f.buf))


# ------------------------------------- extensible array / v2 btree index --
def ext_array(f: FileBuf, elements, filtered, idx_elems=2, dblk_min=2,
              sblk_min_ptrs=4, max_bits=32, page_bits=10,
              uninit_elems=frozenset()):
    """EAHD/EAIB/EADB/EASB for an Extensible Array chunk index (one
    unlimited dim). elements: [(addr, nbytes, mask)] in linear chunk order.
    Geometry mirrors libhdf5 H5EA: idx_elems elements inline in the index
    block; super block u holds 2^(u//2) data blocks of 2^((u+1)//2)*dblk_min
    elements; the first 2*log2(sblk_min_ptrs) super blocks' data blocks are
    addressed straight from the index block, the rest through EASB.

    uninit_elems: global linear chunk indices whose PAGE (in a paged data
    block) is marked uninitialized in the super block's page-init bitmask.
    Those pages are written as poison bytes (0xEE) on disk — like libhdf5,
    which allocates the block at full size but never writes unused pages —
    so a reader that misreads the bitmask sees garbage, not fill."""
    client = 1 if filtered else 0
    elem_size = 8 + 4 + 4 if filtered else 8
    off_size = (max_bits + 7) // 8

    def enc(e):
        a, n, m = e
        return struct.pack('<QII', a, n, m) if filtered else struct.pack('<Q', a)

    def log2(x):
        return x.bit_length() - 1

    nsblks = 1 + max_bits - log2(dblk_min)
    sblk, start_idx, start_dblk = [], 0, 0
    for u in range(nsblks):
        nd, ne = 2 ** (u // 2), 2 ** ((u + 1) // 2) * dblk_min
        sblk.append((nd, ne, start_idx, start_dblk))
        start_idx += nd * ne
        start_dblk += nd
    first_real = 2 * log2(sblk_min_ptrs)
    n_iblk_dblk = 2 * (sblk_min_ptrs - 1)
    n_iblk_sblk = nsblks - first_real

    hdr_addr = f.alloc(4 + 8 + 48 + 8 + 4)  # EAHD written last (back-ptrs)

    page_n = 1 << page_bits
    direct = elements[:idx_elems]
    rest = elements[idx_elems:]
    per_sblk, i = [], 0
    for u in range(nsblks):
        nd, ne, s_idx, _ = sblk[u]
        addrs, masks = [], []
        for d in range(nd):
            if i >= len(rest):
                break
            blk_start = idx_elems + s_idx + d * ne  # global idx of blk[0]
            blk = rest[i:i + ne]
            i += len(blk)
            blk += [(UNDEF, 0, 0)] * (ne - len(blk))
            body = b'EADB' + struct.pack('<BB', 0, client)
            body += struct.pack('<Q', hdr_addr)
            body += blk_start.to_bytes(off_size, 'little')
            page_init = []
            if ne > page_n:
                # paged: checksummed prefix, then bare pages (elems + csum)
                body += struct.pack('<I', lookup3(body))
                for p0 in range(0, ne, page_n):
                    init = all(blk_start + j not in uninit_elems
                               for j in range(p0, p0 + page_n))
                    page_init.append(init)
                    page = (b''.join(enc(e) for e in blk[p0:p0 + page_n])
                            if init else b'\xee' * (page_n * elem_size))
                    body += page + struct.pack('<I', lookup3(page))
            else:
                body += b''.join(enc(e) for e in blk)
                body += struct.pack('<I', lookup3(body))
            addrs.append(f.append(body))
            masks.append(page_init)
        per_sblk.append((addrs, masks))

    iblk_dblk = [a for u in range(min(first_real, nsblks))
                 for a in per_sblk[u][0]]
    iblk_dblk += [UNDEF] * (n_iblk_dblk - len(iblk_dblk))
    sblk_addrs = []
    for u in range(first_real, nsblks):
        nd, ne, s_idx, _ = sblk[u]
        addrs, dmasks = per_sblk[u]
        if not addrs:
            sblk_addrs.append(UNDEF)
            continue
        addrs += [UNDEF] * (nd - len(addrs))
        body = b'EASB' + struct.pack('<BB', 0, client)
        body += struct.pack('<Q', hdr_addr)
        body += (idx_elems + s_idx).to_bytes(off_size, 'little')
        npages = ne // page_n if ne > page_n else 0
        if npages:
            # page-init bitmasks, one per data block, before the addresses.
            # Bit order matches libhdf5 H5VM_bit_set: bit offset 0 lives in
            # the byte's HIGH bit (0x80 >> (off % 8)), MSB-first.
            for d in range(nd):
                init = (dmasks[d] if d < len(dmasks) else []) or [True] * npages
                mb = bytearray((npages + 7) // 8)
                for pg in range(npages):
                    if pg < len(init) and init[pg]:
                        mb[pg // 8] |= 0x80 >> (pg % 8)
                body += bytes(mb)
        body += b''.join(struct.pack('<Q', a) for a in addrs)
        body += struct.pack('<I', lookup3(body))
        sblk_addrs.append(f.append(body))
    sblk_addrs += [UNDEF] * (n_iblk_sblk - len(sblk_addrs))

    ib = b'EAIB' + struct.pack('<BB', 0, client) + struct.pack('<Q', hdr_addr)
    ib += b''.join(enc(e) for e in
                   direct + [(UNDEF, 0, 0)] * (idx_elems - len(direct)))
    ib += b''.join(struct.pack('<Q', a) for a in iblk_dblk)
    ib += b''.join(struct.pack('<Q', a) for a in sblk_addrs)
    ib += struct.pack('<I', lookup3(ib))
    ib_addr = f.append(ib)

    hdr = b'EAHD' + struct.pack('<8B', 0, client, elem_size, max_bits,
                                idx_elems, dblk_min, sblk_min_ptrs, page_bits)
    hdr += struct.pack('<6Q', 0, 0, 0, 0, 0, 0)  # stats (informational)
    hdr += struct.pack('<Q', ib_addr)
    hdr += struct.pack('<I', lookup3(hdr))
    f.write(hdr_addr, hdr)
    return hdr_addr


def layout_v4_ext_array(addr, chunk_dims, max_bits=32, idx_elems=2,
                        sblk_min_ptrs=4, dblk_min=2, page_bits=10):
    body = struct.pack('<BBBBB', 4, 2, 0, len(chunk_dims) + 1, 8)
    body += b''.join(struct.pack('<Q', d) for d in chunk_dims)
    body += struct.pack('<B', 4)
    body += struct.pack('<5B', max_bits, idx_elems, sblk_min_ptrs,
                        dblk_min, page_bits)
    return body + struct.pack('<Q', addr)


def btree2_chunks(f: FileBuf, records, filtered, node_size=512):
    """Depth-0 v2 B-tree chunk index: BTHD whose root is one BTLF leaf.
    records: [(addr, nbytes, mask, scaled_offsets)] — offsets in CHUNK GRID
    coordinates, as the spec's record types 10/11 store them."""
    btype = 11 if filtered else 10
    rank = len(records[0][3])
    rec_size = 8 + (4 + 4 if filtered else 0) + 8 * rank
    body = b'BTLF' + struct.pack('<BB', 0, btype)
    for a, n, m, offs in records:
        body += struct.pack('<Q', a)
        if filtered:
            body += struct.pack('<II', n, m)
        body += b''.join(struct.pack('<Q', o) for o in offs)
    body += struct.pack('<I', lookup3(body))
    leaf = f.append(body)
    hdr = b'BTHD' + struct.pack('<BB', 0, btype)
    hdr += struct.pack('<IHHBB', node_size, rec_size, 0, 100, 40)
    hdr += struct.pack('<QHQ', leaf, len(records), len(records))
    hdr += struct.pack('<I', lookup3(hdr))
    return f.append(hdr)


def btree2_chunks_depth1(f: FileBuf, records, node_size=128):
    """Depth-1 v2 B-tree chunk index (type 10): BTIN root with separator
    records and child pointers (addr + 1-byte record count, sized by the
    leaf-capacity ladder), leaves of up to 3 records. Exercises the
    internal-node walk."""
    btype = 10
    rank = len(records[0][3])
    rec_size = 8 + 8 * rank

    def rec_bytes(r):
        a, _, _, offs = r
        return struct.pack('<Q', a) + b''.join(
            struct.pack('<Q', o) for o in offs)

    groups, seps, i = [], [], 0
    while i < len(records):
        groups.append(records[i:i + 3])
        i += 3
        if i < len(records):
            seps.append(records[i])
            i += 1
    leaf_ptrs = []
    for g in groups:
        body = b'BTLF' + struct.pack('<BB', 0, btype)
        for r in g:
            body += rec_bytes(r)
        body += struct.pack('<I', lookup3(body))
        leaf_ptrs.append((f.append(body), len(g)))
    body = b'BTIN' + struct.pack('<BB', 0, btype)
    for r in seps:
        body += rec_bytes(r)
    for a, n in leaf_ptrs:  # leaf max (128-10)//16 = 7 -> 1-byte count
        body += struct.pack('<QB', a, n)
    body += struct.pack('<I', lookup3(body))
    root = f.append(body)
    hdr = b'BTHD' + struct.pack('<BB', 0, btype)
    hdr += struct.pack('<IHHBB', node_size, rec_size, 1, 100, 40)
    hdr += struct.pack('<QHQ', root, len(seps), len(records))
    hdr += struct.pack('<I', lookup3(hdr))
    return f.append(hdr)


def btree2_chunks_depth2(f: FileBuf, records, node_size=128):
    """Depth-2 v2 B-tree chunk index (type 10): root BTIN -> child BTINs ->
    leaves. Child pointers to internal nodes carry the extra total-record
    count field (1 byte here: cum_max(1) = 39 for these parameters)."""
    btype = 10
    rank = len(records[0][3])
    rec_size = 8 + 8 * rank

    def rec_bytes(r):
        a, _, _, offs = r
        return struct.pack('<Q', a) + b''.join(
            struct.pack('<Q', o) for o in offs)

    def write_leaf(recs):
        body = b'BTLF' + struct.pack('<BB', 0, btype)
        for r in recs:
            body += rec_bytes(r)
        body += struct.pack('<I', lookup3(body))
        return f.append(body), len(recs)

    def write_internal(recs, children, with_total):
        # children: [(addr, nrec, total)]
        body = b'BTIN' + struct.pack('<BB', 0, btype)
        for r in recs:
            body += rec_bytes(r)
        for a, n, tot in children:
            body += struct.pack('<QB', a, n)
            if with_total:
                body += struct.pack('<B', tot)
        body += struct.pack('<I', lookup3(body))
        return f.append(body)

    # shape: [L2 s L2] S [L2 s L2] — 11 records total
    assert len(records) == 11
    r = records
    l0 = write_leaf(r[0:2]); l1 = write_leaf(r[3:5])
    i0 = write_internal([r[2]], [(l0[0], 2, 2), (l1[0], 2, 2)], False)
    l2 = write_leaf(r[6:8]); l3 = write_leaf(r[9:11])
    i1 = write_internal([r[8]], [(l2[0], 2, 2), (l3[0], 2, 2)], False)
    root = write_internal([r[5]], [(i0, 1, 5), (i1, 1, 5)], True)
    hdr = b'BTHD' + struct.pack('<BB', 0, btype)
    hdr += struct.pack('<IHHBB', node_size, rec_size, 2, 100, 40)
    hdr += struct.pack('<QHQ', root, 1, len(records))
    hdr += struct.pack('<I', lookup3(hdr))
    return f.append(hdr)


def layout_v4_btree2(addr, chunk_dims, node_size=512):
    body = struct.pack('<BBBBB', 4, 2, 0, len(chunk_dims) + 1, 8)
    body += b''.join(struct.pack('<Q', d) for d in chunk_dims)
    body += struct.pack('<B', 5) + struct.pack('<IBB', node_size, 100, 40)
    return body + struct.pack('<Q', addr)


def space_unlimited(dims):
    """Simple dataspace with max-dims stored, first dim unlimited."""
    body = struct.pack('<4B4x', 1, len(dims), 1, 0)
    body += b''.join(struct.pack('<Q', d) for d in dims)
    body += b''.join(struct.pack('<Q', d)
                     for d in [UNDEF] + list(dims[1:]))
    return body


def make_unlimited(path: Path):
    """Unlimited-dimension chunk indexes: Extensible Array (one unlimited
    dim — the Eiger append-mode stack shape) through all three addressing
    tiers (inline elements, index-block data blocks, super blocks) and with
    deflate; plus depth-0 v2 B-trees (record types 10 and 11)."""
    f = FileBuf()
    f.alloc(48)

    # ea : [20] f32 chunk [2] -> 10 chunks: inline + index-block data blocks
    raw = b''.join(struct.pack('<f', float(i)) for i in range(20))
    entries = [(f.append(raw[i * 8:(i + 1) * 8]), 8, 0) for i in range(10)]
    ea = object_header_v2(f, [
        (0x01, space_unlimited([20])),
        (0x03, dt_f32()),
        (0x08, layout_v4_ext_array(ext_array(f, entries, filtered=False), [2])),
    ])

    # ea_sb : [80] f32 chunk [2] -> 40 chunks: reaches the super-block tier
    raw2 = b''.join(struct.pack('<f', i * 0.5) for i in range(80))
    entries2 = [(f.append(raw2[i * 8:(i + 1) * 8]), 8, 0) for i in range(40)]
    ea_sb = object_header_v2(f, [
        (0x01, space_unlimited([80])),
        (0x03, dt_f32()),
        (0x08, layout_v4_ext_array(ext_array(f, entries2, filtered=False), [2])),
    ])

    # ea_z : [8,3] f32 chunk [2,3] -> 4 chunks, deflate (client-1 elements)
    H, W = 8, 3
    vals3, _ = f32_grid(H, W)
    entries3 = []
    for r0 in range(0, H, 2):
        chunk = b''.join(struct.pack('<f', vals3[r * W + c])
                         for r in range(r0, r0 + 2) for c in range(W))
        z = zlib.compress(chunk, 6)
        entries3.append((f.append(z), len(z), 0))
    ea_z = object_header_v2(f, [
        (0x01, space_unlimited([H, W])),
        (0x03, dt_f32()),
        (0x0B, filter_deflate()),
        (0x08, layout_v4_ext_array(ext_array(f, entries3, filtered=True),
                                   [2, W])),
    ])

    # bt2 / bt2_z : [4,6] f32 chunk [2,2] -> 2x3 grid of records
    def bt2_records(entries):
        recs, k = [], 0
        for r in range(0, 4, 2):
            for c in range(0, 6, 2):
                a, nb, m = entries[k]
                recs.append((a, nb, m, [r // 2, c // 2]))
                k += 1
        return recs

    entries4, _ = v4_chunk_data(f, 4, 6, 2, 2)
    bt2 = object_header_v2(f, [
        (0x01, space_unlimited([4, 6])),
        (0x03, dt_f32()),
        (0x08, layout_v4_btree2(
            btree2_chunks(f, bt2_records(entries4), filtered=False), [2, 2])),
    ])
    entries5, _ = v4_chunk_data(f, 4, 6, 2, 2, compress=True)
    bt2_z = object_header_v2(f, [
        (0x01, space_unlimited([4, 6])),
        (0x03, dt_f32()),
        (0x0B, filter_deflate()),
        (0x08, layout_v4_btree2(
            btree2_chunks(f, bt2_records(entries5), filtered=True), [2, 2])),
    ])

    # ea_paged : [160] f32 chunk [2] -> 80 chunks with page_bits=3, so
    # super block 5's 16-element data block splits into 2 checksummed
    # pages. Page 1 (chunks 72-79) is marked UNINITIALIZED in the
    # MSB-first page-init bitmask and poisoned on disk: elements 144-159
    # must read as fill (0.0), and a reader with the wrong bit order
    # trips over the poison instead of silently passing.
    raw7 = b''.join(struct.pack('<f', i * 0.125) for i in range(160))
    entries7 = [(f.append(raw7[i * 8:(i + 1) * 8]), 8, 0) for i in range(80)]
    ea_paged = object_header_v2(f, [
        (0x01, space_unlimited([160])),
        (0x03, dt_f32()),
        (0x08, layout_v4_ext_array(
            ext_array(f, entries7, filtered=False, page_bits=3,
                      uninit_elems=frozenset(range(72, 80))), [2],
            page_bits=3)),
    ])

    # bt2_deep : 1-D [22] f32 chunk [2] -> 11 records in a DEPTH-1 tree
    raw6 = b''.join(struct.pack('<f', i * 0.25) for i in range(22))
    recs6 = [(f.append(raw6[i * 8:(i + 1) * 8]), 8, 0, [i])
             for i in range(11)]
    bt2_deep = object_header_v2(f, [
        (0x01, space_unlimited([22])),
        (0x03, dt_f32()),
        (0x08, layout_v4_btree2(
            btree2_chunks_depth1(f, recs6), [2], node_size=128)),
    ])

    # bt2_deep2 : same 11 records through a DEPTH-2 tree (total-count
    # pointer fields exercised)
    raw8 = b''.join(struct.pack('<f', i * 0.75) for i in range(22))
    recs8 = [(f.append(raw8[i * 8:(i + 1) * 8]), 8, 0, [i])
             for i in range(11)]
    bt2_deep2 = object_header_v2(f, [
        (0x01, space_unlimited([22])),
        (0x03, dt_f32()),
        (0x08, layout_v4_btree2(
            btree2_chunks_depth2(f, recs8), [2], node_size=128)),
    ])

    detector = group_v2(f, {'ea': ea, 'ea_sb': ea_sb, 'ea_z': ea_z,
                            'ea_paged': ea_paged,
                            'bt2': bt2, 'bt2_z': bt2_z,
                            'bt2_deep': bt2_deep,
                            'bt2_deep2': bt2_deep2})
    finish_v2(f, group_v2(f, {'detector': detector}), path)


# ------------------------------------------------- dense groups (FRHP) ----
def fractal_heap_links(f: FileBuf, link_bodies):
    """A single-direct-block fractal heap holding link-message bodies, plus
    the name-index v2 B-tree (record type 5: hash + heap ID). Returns
    (fheap_addr, btree_addr). Managed heap IDs are
    flags(1)+offset(off_size)+length(len_size); offsets count from the
    direct block's start (its header occupies the first virtual bytes)."""
    width, start_size, max_bits, max_man = 4, 512, 32, 4096
    off_size = (max_bits + 7) // 8
    len_size = min(off_size, (max_man.bit_length() + 7) // 8)
    heap_id_len = 1 + off_size + len_size

    hdr_addr = f.alloc(4 + 1 + 2 + 2 + 1 + 4 + 12 * 8 + 2 + 8 + 8
                       + 2 + 2 + 8 + 2 + 4)

    # direct block: FHDB header then packed objects
    body = b'FHDB' + struct.pack('<B', 0) + struct.pack('<Q', hdr_addr)
    body += (0).to_bytes(off_size, 'little')
    ids = []
    for name, lm in link_bodies:
        ids.append((name, len(body), len(lm)))
        body += lm
    used = len(body)
    assert used <= start_size, "fixture heap overflows one direct block"
    dblock_addr = f.append(body + b'\0' * (start_size - used))

    # name-index B-tree, sorted by lookup3(name) like libhdf5's hash order
    recs = sorted((lookup3(n.encode()), off, ln) for n, off, ln in ids)
    rec_size = 4 + heap_id_len
    leaf = b'BTLF' + struct.pack('<BB', 0, 5)
    for h, off, ln in recs:
        leaf += struct.pack('<IB', h, 0)
        leaf += off.to_bytes(off_size, 'little') + ln.to_bytes(len_size, 'little')
    leaf += struct.pack('<I', lookup3(leaf))
    leaf_addr = f.append(leaf)
    bt = b'BTHD' + struct.pack('<BB', 0, 5)
    bt += struct.pack('<IHHBB', 512, rec_size, 0, 100, 40)
    bt += struct.pack('<QHQ', leaf_addr, len(recs), len(recs))
    bt += struct.pack('<I', lookup3(bt))
    btree_addr = f.append(bt)

    hdr = b'FRHP' + struct.pack('<B', 0)
    hdr += struct.pack('<HHB', heap_id_len, 0, 0)  # id len, filters, flags
    hdr += struct.pack('<I', max_man)
    hdr += struct.pack('<QQ', 0, UNDEF)            # next huge id, huge btree
    hdr += struct.pack('<QQ', start_size - used, UNDEF)  # free space, fs mgr
    hdr += struct.pack('<QQ', start_size, start_size)    # managed, allocated
    hdr += struct.pack('<QQ', used, len(ids))      # iterator, num managed
    hdr += struct.pack('<QQQQ', 0, 0, 0, 0)        # huge/tiny size+count
    hdr += struct.pack('<H', width)
    hdr += struct.pack('<QQ', start_size, 64 * 1024)
    hdr += struct.pack('<HH', max_bits, 0)         # max heap bits, start rows
    hdr += struct.pack('<QH', dblock_addr, 0)      # root block, cur rows = 0
    hdr += struct.pack('<I', lookup3(hdr))
    f.write(hdr_addr, hdr)
    return hdr_addr, btree_addr


def fractal_heap_links_filtered(f: FileBuf, link_bodies):
    """Single-direct-block fractal heap whose direct block is stored as ONE
    deflate-filtered stream (the NeXus long-group shape with compressed
    link heaps). The header carries the encoded pipeline plus the filtered
    root-block size and filter mask (H5HF__hdr_decode order)."""
    width, start_size, max_bits, max_man = 4, 512, 32, 4096
    off_size = (max_bits + 7) // 8
    len_size = min(off_size, (max_man.bit_length() + 7) // 8)
    heap_id_len = 1 + off_size + len_size
    pline = filter_pipeline([(1, b'deflate', [6])])

    hdr_addr = f.alloc(4 + 1 + 2 + 2 + 1 + 4 + 12 * 8 + 2 + 8 + 8
                       + 2 + 2 + 8 + 2 + 8 + 4 + len(pline) + 4)

    body = b'FHDB' + struct.pack('<B', 0) + struct.pack('<Q', hdr_addr)
    body += (0).to_bytes(off_size, 'little')
    ids = []
    for name, lm in link_bodies:
        ids.append((name, len(body), len(lm)))
        body += lm
    used = len(body)
    assert used <= start_size, "fixture heap overflows one direct block"
    z = zlib.compress(body + b'\0' * (start_size - used), 6)
    dblock_addr = f.append(z)

    recs = sorted((lookup3(n.encode()), off, ln) for n, off, ln in ids)
    rec_size = 4 + heap_id_len
    leaf = b'BTLF' + struct.pack('<BB', 0, 5)
    for h, off, ln in recs:
        leaf += struct.pack('<IB', h, 0)
        leaf += off.to_bytes(off_size, 'little') + ln.to_bytes(len_size, 'little')
    leaf += struct.pack('<I', lookup3(leaf))
    leaf_addr = f.append(leaf)
    bt = b'BTHD' + struct.pack('<BB', 0, 5)
    bt += struct.pack('<IHHBB', 512, rec_size, 0, 100, 40)
    bt += struct.pack('<QHQ', leaf_addr, len(recs), len(recs))
    bt += struct.pack('<I', lookup3(bt))
    btree_addr = f.append(bt)

    hdr = b'FRHP' + struct.pack('<B', 0)
    hdr += struct.pack('<HHB', heap_id_len, len(pline), 0)
    hdr += struct.pack('<I', max_man)
    hdr += struct.pack('<QQ', 0, UNDEF)
    hdr += struct.pack('<QQ', start_size - used, UNDEF)
    hdr += struct.pack('<QQ', start_size, start_size)
    hdr += struct.pack('<QQ', used, len(ids))
    hdr += struct.pack('<QQQQ', 0, 0, 0, 0)
    hdr += struct.pack('<H', width)
    hdr += struct.pack('<QQ', start_size, 64 * 1024)
    hdr += struct.pack('<HH', max_bits, 0)
    hdr += struct.pack('<QH', dblock_addr, 0)
    hdr += struct.pack('<QI', len(z), 0)  # filtered root size + filter mask
    hdr += pline
    hdr += struct.pack('<I', lookup3(hdr))
    f.write(hdr_addr, hdr)
    return hdr_addr, btree_addr


def fractal_heap_links_indirect_filtered(f: FileBuf, link_bodies,
                                         start_size=128):
    """Indirect-rooted FILTERED fractal heap: each direct block compressed
    as its own deflate stream, the root FHIB storing
    (address, filtered size, filter mask) per direct-block entry."""
    width, max_bits, max_man = 4, 32, 4096
    off_size = (max_bits + 7) // 8
    len_size = min(off_size, (max_man.bit_length() + 7) // 8)
    heap_id_len = 1 + off_size + len_size
    dhdr = 4 + 1 + 8 + off_size
    pline = filter_pipeline([(1, b'deflate', [6])])

    hdr_addr = f.alloc(4 + 1 + 2 + 2 + 1 + 4 + 12 * 8 + 2 + 8 + 8
                       + 2 + 2 + 8 + 2 + 8 + 4 + len(pline) + 4)

    blocks, cur, cur_off, ids = [], None, 0, []
    for name, lm in link_bodies:
        if cur is None or cur_off + len(lm) > start_size:
            vbase = len(blocks) * start_size
            cur = bytearray(b'FHDB' + struct.pack('<B', 0)
                            + struct.pack('<Q', hdr_addr)
                            + vbase.to_bytes(off_size, 'little'))
            cur_off = dhdr
            blocks.append((vbase, cur))
        ids.append((name, blocks[-1][0] + cur_off, len(lm)))
        cur.extend(lm)
        cur_off += len(lm)
    assert len(blocks) <= 2 * width, "fixture outgrew rows 0+1"
    zblocks = [zlib.compress(bytes(b) + b'\0' * (start_size - len(b)), 6)
               for _, b in blocks]
    dblk_addrs = [f.append(z) for z in zblocks]
    nrows = (len(blocks) + width - 1) // width
    ib = b'FHIB' + struct.pack('<B', 0) + struct.pack('<Q', hdr_addr)
    ib += (0).to_bytes(off_size, 'little')
    for i in range(nrows * width):
        if i < len(dblk_addrs):
            ib += struct.pack('<QQI', dblk_addrs[i], len(zblocks[i]), 0)
        else:
            ib += struct.pack('<QQI', UNDEF, 0, 0)
    ib += struct.pack('<I', lookup3(ib))
    root_addr = f.append(ib)

    recs = sorted((lookup3(n.encode()), off, ln) for n, off, ln in ids)
    rec_size = 4 + heap_id_len
    leaf = b'BTLF' + struct.pack('<BB', 0, 5)
    for h, off, ln in recs:
        leaf += struct.pack('<IB', h, 0)
        leaf += off.to_bytes(off_size, 'little') + ln.to_bytes(len_size, 'little')
    leaf += struct.pack('<I', lookup3(leaf))
    leaf_addr = f.append(leaf)
    bt = b'BTHD' + struct.pack('<BB', 0, 5)
    bt += struct.pack('<IHHBB', 512, rec_size, 0, 100, 40)
    bt += struct.pack('<QHQ', leaf_addr, len(recs), len(recs))
    bt += struct.pack('<I', lookup3(bt))
    btree_addr = f.append(bt)

    hdr = b'FRHP' + struct.pack('<B', 0)
    hdr += struct.pack('<HHB', heap_id_len, len(pline), 0)
    hdr += struct.pack('<I', max_man)
    hdr += struct.pack('<QQ', 0, UNDEF)
    hdr += struct.pack('<QQ', 0, UNDEF)
    hdr += struct.pack('<QQ', len(blocks) * start_size, len(blocks) * start_size)
    hdr += struct.pack('<QQ', len(blocks) * start_size, len(ids))
    hdr += struct.pack('<QQQQ', 0, 0, 0, 0)
    hdr += struct.pack('<H', width)
    hdr += struct.pack('<QQ', start_size, 64 * 1024)
    hdr += struct.pack('<HH', max_bits, nrows)
    hdr += struct.pack('<QH', root_addr, nrows)
    hdr += struct.pack('<QI', 0, 0)  # no filtered ROOT DIRECT block
    hdr += pline
    hdr += struct.pack('<I', lookup3(hdr))
    f.write(hdr_addr, hdr)
    return hdr_addr, btree_addr


def fractal_heap_links_indirect(f: FileBuf, link_bodies, start_size=128):
    """Indirect-rooted fractal heap: objects packed across several small
    direct blocks, a root FHIB indirect block addressing them row-wise
    (doubling table, direct rows only). Returns (fheap_addr, btree_addr)."""
    width, max_bits, max_man = 4, 32, 4096
    off_size = (max_bits + 7) // 8
    len_size = min(off_size, (max_man.bit_length() + 7) // 8)
    heap_id_len = 1 + off_size + len_size
    dhdr = 4 + 1 + 8 + off_size  # FHDB header bytes (no checksum, flags=0)

    hdr_addr = f.alloc(4 + 1 + 2 + 2 + 1 + 4 + 12 * 8 + 2 + 8 + 8
                       + 2 + 2 + 8 + 2 + 4)

    # greedy-pack objects into row-0/row-1 direct blocks of start_size
    blocks, cur, cur_off, ids = [], None, 0, []
    for name, lm in link_bodies:
        if cur is None or cur_off + len(lm) > start_size:
            vbase = len(blocks) * start_size  # rows 0/1 are uniform size
            cur = bytearray(b'FHDB' + struct.pack('<B', 0)
                            + struct.pack('<Q', hdr_addr)
                            + vbase.to_bytes(off_size, 'little'))
            cur_off = dhdr
            blocks.append((vbase, cur))
        ids.append((name, blocks[-1][0] + cur_off, len(lm)))
        cur.extend(lm)
        cur_off += len(lm)
    assert len(blocks) <= 2 * width, "fixture outgrew rows 0+1"
    dblk_addrs = [f.append(bytes(b) + b'\0' * (start_size - len(b)))
                  for _, b in blocks]
    nrows = (len(blocks) + width - 1) // width
    ib = b'FHIB' + struct.pack('<B', 0) + struct.pack('<Q', hdr_addr)
    ib += (0).to_bytes(off_size, 'little')
    slots = dblk_addrs + [UNDEF] * (nrows * width - len(dblk_addrs))
    ib += b''.join(struct.pack('<Q', a) for a in slots)
    ib += struct.pack('<I', lookup3(ib))
    root_addr = f.append(ib)

    recs = sorted((lookup3(n.encode()), off, ln) for n, off, ln in ids)
    rec_size = 4 + heap_id_len
    leaf = b'BTLF' + struct.pack('<BB', 0, 5)
    for h, off, ln in recs:
        leaf += struct.pack('<IB', h, 0)
        leaf += off.to_bytes(off_size, 'little') + ln.to_bytes(len_size, 'little')
    leaf += struct.pack('<I', lookup3(leaf))
    leaf_addr = f.append(leaf)
    bt = b'BTHD' + struct.pack('<BB', 0, 5)
    bt += struct.pack('<IHHBB', 512, rec_size, 0, 100, 40)
    bt += struct.pack('<QHQ', leaf_addr, len(recs), len(recs))
    bt += struct.pack('<I', lookup3(bt))
    btree_addr = f.append(bt)

    hdr = b'FRHP' + struct.pack('<B', 0)
    hdr += struct.pack('<HHB', heap_id_len, 0, 0)
    hdr += struct.pack('<I', max_man)
    hdr += struct.pack('<QQ', 0, UNDEF)
    hdr += struct.pack('<QQ', 0, UNDEF)
    hdr += struct.pack('<QQ', len(blocks) * start_size, len(blocks) * start_size)
    hdr += struct.pack('<QQ', len(blocks) * start_size, len(ids))
    hdr += struct.pack('<QQQQ', 0, 0, 0, 0)
    hdr += struct.pack('<H', width)
    hdr += struct.pack('<QQ', start_size, 64 * 1024)
    hdr += struct.pack('<HH', max_bits, nrows)
    hdr += struct.pack('<QH', root_addr, nrows)  # root FHIB, cur rows > 0
    hdr += struct.pack('<I', lookup3(hdr))
    f.write(hdr_addr, hdr)
    return hdr_addr, btree_addr


def fractal_heap_links_deep(f: FileBuf, link_bodies):
    """Depth-2 fractal heap: root FHIB whose row 3 holds a CHILD indirect
    block. width=4, start=128, max_direct=256 -> max_direct_rows=3, so the
    root's rows 0-2 are direct blocks (8x128 + 4x256 = offsets 0..2047)
    and row 3 entries are child FHIBs spanning 512 each with one internal
    row of 4x128 direct blocks (nrows = u - log2(width) = 1).
    Returns (fheap_addr, btree_addr)."""
    width, max_bits, max_man = 4, 32, 4096
    start_size, max_direct = 128, 256
    off_size = (max_bits + 7) // 8
    len_size = min(off_size, (max_man.bit_length() + 7) // 8)
    heap_id_len = 1 + off_size + len_size
    dhdr = 4 + 1 + 8 + off_size

    hdr_addr = f.alloc(4 + 1 + 2 + 2 + 1 + 4 + 12 * 8 + 2 + 8 + 8
                       + 2 + 2 + 8 + 2 + 4)

    # direct-block slots in heap-offset order: root rows 0-2, then child
    # row 0 (sizes restart at start_size inside the child)
    slot_sizes = [128] * 8 + [256] * 4 + [128] * 4
    slot_vbase, acc = [], 0
    for s in slot_sizes:
        slot_vbase.append(acc)
        acc += s

    blocks, ids, si = [], [], -1
    cur, cur_off = None, 0
    for name, lm in link_bodies:
        if cur is None or cur_off + len(lm) > slot_sizes[si]:
            si += 1
            assert si < len(slot_sizes), "fixture outgrew the slot table"
            cur = bytearray(b'FHDB' + struct.pack('<B', 0)
                            + struct.pack('<Q', hdr_addr)
                            + slot_vbase[si].to_bytes(off_size, 'little'))
            cur_off = dhdr
            blocks.append((si, cur))
        ids.append((name, slot_vbase[si] + cur_off, len(lm)))
        cur.extend(lm)
        cur_off += len(lm)
    assert si >= 12, "fixture must reach the child indirect block's slots"
    addr_by_slot = {s: f.append(bytes(b) + b'\0' * (slot_sizes[s] - len(b)))
                    for s, b in blocks}

    def fhib(slots, nrows):
        ib = b'FHIB' + struct.pack('<B', 0) + struct.pack('<Q', hdr_addr)
        ib += (0).to_bytes(off_size, 'little')
        ib += b''.join(struct.pack('<Q', a) for a in slots)
        ib += struct.pack('<I', lookup3(ib))
        return f.append(ib)

    child = fhib([addr_by_slot.get(12 + i, UNDEF) for i in range(4)], 1)
    root = fhib([addr_by_slot.get(i, UNDEF) for i in range(12)]
                + [child, UNDEF, UNDEF, UNDEF], 4)

    recs = sorted((lookup3(n.encode()), off, ln) for n, off, ln in ids)
    rec_size = 4 + heap_id_len
    leaf = b'BTLF' + struct.pack('<BB', 0, 5)
    for h, off, ln in recs:
        leaf += struct.pack('<IB', h, 0)
        leaf += off.to_bytes(off_size, 'little') + ln.to_bytes(len_size, 'little')
    leaf += struct.pack('<I', lookup3(leaf))
    leaf_addr = f.append(leaf)
    bt = b'BTHD' + struct.pack('<BB', 0, 5)
    bt += struct.pack('<IHHBB', 2048, rec_size, 0, 100, 40)
    bt += struct.pack('<QHQ', leaf_addr, len(recs), len(recs))
    bt += struct.pack('<I', lookup3(bt))
    btree_addr = f.append(bt)

    used = acc
    hdr = b'FRHP' + struct.pack('<B', 0)
    hdr += struct.pack('<HHB', heap_id_len, 0, 0)
    hdr += struct.pack('<I', max_man)
    hdr += struct.pack('<QQ', 0, UNDEF)
    hdr += struct.pack('<QQ', 0, UNDEF)
    hdr += struct.pack('<QQ', used, used)
    hdr += struct.pack('<QQ', used, len(ids))
    hdr += struct.pack('<QQQQ', 0, 0, 0, 0)
    hdr += struct.pack('<H', width)
    hdr += struct.pack('<QQ', start_size, max_direct)
    hdr += struct.pack('<HH', max_bits, 4)
    hdr += struct.pack('<QH', root, 4)  # root FHIB, 4 current rows
    hdr += struct.pack('<I', lookup3(hdr))
    f.write(hdr_addr, hdr)
    return hdr_addr, btree_addr


def attr_info_dense(f: FileBuf, named_bodies, filtered=False, chain='deflate',
                    partial_mask=0):
    """Attribute Info (0x15) message body with DENSE storage: attribute
    messages in a single-direct-block fractal heap, name-indexed by a
    type-8 v2 B-tree (8-byte heap ID, message flags, creation order,
    hash). With filtered=True the direct block is one filtered stream and
    huge objects are each their own filtered stream indexed by TYPE-2
    records (addr, filtered length, mask, memory size, id); `chain`
    selects the pipeline: 'deflate' alone, or 'szf' = shuffle + deflate
    + fletcher32 (checksum over the compressed stream, write order).
    Returns the 0x15 message body."""
    width, start_size, max_bits, max_man = 4, 512, 32, 4096
    off_size = (max_bits + 7) // 8
    len_size = min(off_size, (max_man.bit_length() + 7) // 8)
    heap_id_len = 8  # attribute heaps use the fixed 8-byte ID form

    def encode_stream(data, mask=0):
        """Apply the pipeline, skipping stages whose mask bit is set
        (libhdf5 records a skipped OPTIONAL filter this way)."""
        if not filtered:
            return data
        if chain == 'szf':
            s = data if mask & 1 else shuffle_bytes(data, 4)
            if not mask & 2:
                s = zlib.compress(s, 6)
            if not mask & 4:
                s = s + struct.pack('<I', fletcher32(s))
            return s
        return data if mask & 1 else zlib.compress(data, 6)

    pline = b''
    if filtered:
        pline = filter_pipeline(
            [(2, b'shuffle', [4]), (1, b'deflate', [6]),
             (3, b'fletcher32', [])] if chain == 'szf'
            else [(1, b'deflate', [6])])

    hdr_addr = f.alloc(4 + 1 + 2 + 2 + 1 + 4 + 12 * 8 + 2 + 8 + 8
                       + 2 + 2 + 8 + 2 + (8 + 4 + len(pline) if filtered else 0)
                       + 4)
    body = b'FHDB' + struct.pack('<B', 0) + struct.pack('<Q', hdr_addr)
    body += (0).to_bytes(off_size, 'little')
    ids = []  # (name, heap-id bytes)
    huge_recs = []
    for name, ab in named_bodies:
        if len(ab) > max_man:
            # huge: own stream in the file, indexed by the huge b-tree
            hid = struct.pack('<B', 0x10)
            hid += (len(huge_recs) + 1).to_bytes(heap_id_len - 1, 'little')
            stored = encode_stream(ab, partial_mask)
            huge_recs.append((f.append(stored), len(stored), len(ab),
                              len(huge_recs) + 1))
        else:
            hid = (struct.pack('<B', 0) + len(body).to_bytes(off_size, 'little')
                   + len(ab).to_bytes(len_size, 'little'))
            hid += b'\0' * (heap_id_len - len(hid))
            body += ab
        ids.append((name, hid))
    used = len(body)
    assert used <= start_size, "fixture attr heap overflows one direct block"
    full = body + b'\0' * (start_size - used)
    zfull = encode_stream(full, partial_mask)
    dblock_addr = f.append(zfull)

    huge_btree = UNDEF
    if huge_recs:
        # 8-byte heap IDs cannot embed (addr, length), so libhdf5 stores
        # huge objects INDIRECTLY: B-tree record type 1 (unfiltered) or
        # 2 (filtered), the ID-bearing layouts — the B-tree maps the
        # sequential ID to the object. Types 3/4 are the directly-
        # accessed (ID-embedded, no ID field) forms, impossible here.
        rtype = 2 if filtered else 1
        leaf = b'BTLF' + struct.pack('<BB', 0, rtype)
        for a, stored_ln, mem_ln, i in huge_recs:
            if filtered:  # type-2: addr, filt len, mask, memory size, id
                leaf += struct.pack('<QQIQQ', a, stored_ln, partial_mask,
                                    mem_ln, i)
            else:  # type-1: addr, length, id
                leaf += struct.pack('<QQQ', a, stored_ln, i)
        leaf += struct.pack('<I', lookup3(leaf))
        leaf_addr = f.append(leaf)
        bt = b'BTHD' + struct.pack('<BB', 0, rtype)
        bt += struct.pack('<IHHBB', 512, 36 if filtered else 24, 0, 100, 40)
        bt += struct.pack('<QHQ', leaf_addr, len(huge_recs), len(huge_recs))
        bt += struct.pack('<I', lookup3(bt))
        huge_btree = f.append(bt)

    recs = sorted((lookup3(n.encode()), hid) for n, hid in ids)
    rec_size = 8 + 1 + 4 + 4
    leaf = b'BTLF' + struct.pack('<BB', 0, 8)
    for h, hid in recs:
        leaf += hid + struct.pack('<BII', 0, 0, h)  # msg flags, corder, hash
    leaf += struct.pack('<I', lookup3(leaf))
    leaf_addr = f.append(leaf)
    bt = b'BTHD' + struct.pack('<BB', 0, 8)
    bt += struct.pack('<IHHBB', 512, rec_size, 0, 100, 40)
    bt += struct.pack('<QHQ', leaf_addr, len(recs), len(recs))
    bt += struct.pack('<I', lookup3(bt))
    btree_addr = f.append(bt)

    hdr = b'FRHP' + struct.pack('<B', 0)
    hdr += struct.pack('<HHB', heap_id_len, len(pline), 0)
    hdr += struct.pack('<I', max_man)
    hdr += struct.pack('<QQ', len(huge_recs) + 1, huge_btree)
    hdr += struct.pack('<QQ', start_size - used, UNDEF)
    hdr += struct.pack('<QQ', start_size, start_size)
    hdr += struct.pack('<QQ', used, len(ids))
    hdr += struct.pack('<QQ', sum(r[2] for r in huge_recs), len(huge_recs))
    hdr += struct.pack('<QQ', 0, 0)
    hdr += struct.pack('<H', width)
    hdr += struct.pack('<QQ', start_size, 64 * 1024)
    hdr += struct.pack('<HH', max_bits, 0)
    hdr += struct.pack('<QH', dblock_addr, 0)
    if filtered:
        hdr += struct.pack('<QI', len(zfull), partial_mask) + pline
    hdr += struct.pack('<I', lookup3(hdr))
    f.write(hdr_addr, hdr)
    return struct.pack('<BB', 0, 0) + struct.pack('<QQ', hdr_addr, btree_addr)


def group_v2_dense(f: FileBuf, link_bodies, indirect=False):
    """Group whose links live in dense storage: the object header carries
    ONLY a Link Info message pointing at the fractal heap + name index."""
    fheap, btree = (fractal_heap_links_indirect(f, link_bodies) if indirect
                    else fractal_heap_links(f, link_bodies))
    li = struct.pack('<BB', 0, 0) + struct.pack('<QQ', fheap, btree)
    return object_header_v2(f, [(0x02, li)])


def make_dense(path: Path):
    """A dense-storage group shaped like a long Eiger master: 12 hard-linked
    scalar datasets plus external links — past the compact-link threshold,
    so links live in a fractal heap with a v2 B-tree name index."""
    f = FileBuf()
    f.alloc(48)
    bodies = []
    for i in range(12):
        raw = f.append(struct.pack('<d', i * 1.5))
        ds = object_header_v2(f, [
            (0x01, space_scalar()), (0x03, dt_f64()),
            (0x08, layout_contiguous(raw, 8))])
        name = f'value_{i:03d}'
        bodies.append((name, link_msg(name, ds)))
    bodies.append(('data_000001',
                   ext_link_msg('data_000001', 'nope_data.h5', '/entry/data')))
    data = group_v2_dense(f, bodies)

    # a second dense group big enough to outgrow one direct block: its
    # heap is INDIRECT-rooted (FHIB row of small direct blocks)
    bodies2 = []
    for i in range(14):
        raw = f.append(struct.pack('<d', i * 0.5))
        ds = object_header_v2(f, [
            (0x01, space_scalar()), (0x03, dt_f64()),
            (0x08, layout_contiguous(raw, 8))])
        name = f'frame_{i:03d}'
        bodies2.append((name, link_msg(name, ds)))
    data2 = group_v2_dense(f, bodies2, indirect=True)

    # a third dense group deep enough for a CHILD indirect block: 110
    # hard links (aliasing 4 shared targets — hard links may alias) spill
    # past the root FHIB's three direct rows into a row-3 child FHIB
    targets = []
    for i in range(4):
        raw = f.append(struct.pack('<d', i * 2.25))
        targets.append(object_header_v2(f, [
            (0x01, space_scalar()), (0x03, dt_f64()),
            (0x08, layout_contiguous(raw, 8))]))
    bodies3 = [(f'g_{i:03d}', link_msg(f'g_{i:03d}', targets[i % 4]))
               for i in range(110)]
    fheap3, btree3 = fractal_heap_links_deep(f, bodies3)
    li3 = struct.pack('<BB', 0, 0) + struct.pack('<QQ', fheap3, btree3)
    data3 = object_header_v2(f, [(0x02, li3)])

    # a FILTERED single-direct-block heap (compressed link names, the
    # large-NeXus-group shape): same link semantics through the deflate path
    bodies4 = []
    for i in range(10):
        raw = f.append(struct.pack('<d', i * 3.5))
        ds = object_header_v2(f, [
            (0x01, space_scalar()), (0x03, dt_f64()),
            (0x08, layout_contiguous(raw, 8))])
        name = f'zvalue_{i:03d}'
        bodies4.append((name, link_msg(name, ds)))
    fheap4, btree4 = fractal_heap_links_filtered(f, bodies4)
    li4 = struct.pack('<BB', 0, 0) + struct.pack('<QQ', fheap4, btree4)
    data4 = object_header_v2(f, [(0x02, li4)])

    # a FILTERED indirect-rooted heap: per-entry (addr, filtered size,
    # filter mask) triplets in the root FHIB
    bodies5 = []
    for i in range(14):
        raw = f.append(struct.pack('<d', i * 4.5))
        ds = object_header_v2(f, [
            (0x01, space_scalar()), (0x03, dt_f64()),
            (0x08, layout_contiguous(raw, 8))])
        name = f'zframe_{i:03d}'
        bodies5.append((name, link_msg(name, ds)))
    fheap5, btree5 = fractal_heap_links_indirect_filtered(f, bodies5)
    li5 = struct.pack('<BB', 0, 0) + struct.pack('<QQ', fheap5, btree5)
    data5 = object_header_v2(f, [(0x02, li5)])

    # a dataset with 10 attributes -> dense attribute storage (0x15)
    raw = f.append(struct.pack('<d', 42.0))
    attr_bodies = [('units', attr_v3('units', dt_str(3), space_scalar(),
                                     b'mm\x00'))]
    for i in range(9):
        attr_bodies.append((f'a{i:02d}',
                            attr_v3(f'a{i:02d}', dt_str(4), space_scalar(),
                                    f'v{i:02d}\x00'.encode())))
    # one attribute past max_man_size -> HUGE heap ID via the huge b-tree
    attr_bodies.append(('blob', attr_v3('blob', dt_str(5000), space_scalar(),
                                        b'x' * 4999 + b'\x00')))
    manyattrs = object_header_v2(f, [
        (0x01, space_scalar()), (0x03, dt_f64()),
        (0x08, layout_contiguous(raw, 8)),
        (0x15, attr_info_dense(f, attr_bodies)),
    ])

    # FILTERED dense attributes: compressed attribute heap plus a >4 KB
    # blob stored as its own deflate stream behind a TYPE-2 huge record
    raw2 = f.append(struct.pack('<d', 43.0))
    attr_bodies2 = [(f'z{i:02d}',
                     attr_v3(f'z{i:02d}', dt_str(4), space_scalar(),
                             f'w{i:02d}\x00'.encode())) for i in range(6)]
    attr_bodies2.append(('zblob', attr_v3('zblob', dt_str(6000),
                                          space_scalar(),
                                          b'y' * 5999 + b'\x00')))
    manyattrs2 = object_header_v2(f, [
        (0x01, space_scalar()), (0x03, dt_f64()),
        (0x08, layout_contiguous(raw2, 8)),
        (0x15, attr_info_dense(f, attr_bodies2, filtered=True)),
    ])

    # full classic pipeline on the attribute heap: shuffle + deflate +
    # fletcher32 — exercises the multi-stage per-stage target sizes on
    # BOTH the managed direct block and the type-2 huge-object stream
    raw3 = f.append(struct.pack('<d', 44.0))
    attr_bodies3 = [(f'k{i:02d}',
                     attr_v3(f'k{i:02d}', dt_str(4), space_scalar(),
                             f'u{i:02d}\x00'.encode())) for i in range(5)]
    attr_bodies3.append(('kblob', attr_v3('kblob', dt_str(5500),
                                          space_scalar(),
                                          b'q' * 5499 + b'\x00')))
    manyattrs3 = object_header_v2(f, [
        (0x01, space_scalar()), (0x03, dt_f64()),
        (0x08, layout_contiguous(raw3, 8)),
        (0x15, attr_info_dense(f, attr_bodies3, filtered=True, chain='szf')),
    ])

    # PARTIALLY-filtered heap: deflate (an optional filter) skipped at
    # write time for both the direct block and the huge stream — the
    # stored streams are shuffle+fletcher32 only, filter mask bit 1 set
    # in the heap header and in the type-2 huge record
    raw4 = f.append(struct.pack('<d', 45.0))
    attr_bodies4 = [(f'p{i:02d}',
                     attr_v3(f'p{i:02d}', dt_str(4), space_scalar(),
                             f't{i:02d}\x00'.encode())) for i in range(5)]
    attr_bodies4.append(('pblob', attr_v3('pblob', dt_str(5200),
                                          space_scalar(),
                                          b'r' * 5199 + b'\x00')))
    manyattrs4 = object_header_v2(f, [
        (0x01, space_scalar()), (0x03, dt_f64()),
        (0x08, layout_contiguous(raw4, 8)),
        (0x15, attr_info_dense(f, attr_bodies4, filtered=True, chain='szf',
                               partial_mask=2)),
    ])

    entry = group_v2(f, {'data': data, 'data2': data2, 'data3': data3,
                         'data4': data4, 'data5': data5,
                         'manyattrs': manyattrs, 'manyattrs2': manyattrs2,
                         'manyattrs3': manyattrs3, 'manyattrs4': manyattrs4})
    finish_v2(f, group_v2(f, {'entry': entry}), path)


def finish_v2(f: FileBuf, root, path: Path):
    """Write the superblock-v2 header into the 48-byte slot alloc'd first."""
    sb = bytearray()
    sb += bytes([0x89]) + b'HDF' + bytes([0x0D, 0x0A, 0x1A, 0x0A])
    sb += struct.pack('<4B', 2, 8, 8, 0)
    sb += struct.pack('<QQQQ', 0, UNDEF, len(f.buf), root)
    sb += struct.pack('<I', lookup3(bytes(sb)))
    f.write(0, bytes(sb))
    path.write_bytes(bytes(f.buf))


def make_extlink(outdir: Path):
    """Eiger-shaped external-link fixtures: master.h5 grafts a dataset and a
    whole group out of sibling data_000001.h5; links to a missing file and a
    missing object degrade to marker nodes; cycle_a/cycle_b external-link
    each other to exercise the cross-file cycle guard."""
    outdir.mkdir(parents=True, exist_ok=True)

    # data_000001.h5 : /entry/data/data (2x3 f32) + /entry/sub/{x,y}
    f = FileBuf()
    f.alloc(48)
    _, img = f32_grid(2, 3, scale=2.0)
    img_raw = f.append(img)
    data = object_header_v2(f, [
        (0x01, space_simple([2, 3])),
        (0x03, dt_f32()),
        (0x08, layout_contiguous(img_raw, len(img))),
    ])
    x_raw = f.append(struct.pack('<d', 1.5))
    x = object_header_v2(f, [
        (0x01, space_scalar()), (0x03, dt_f64()),
        (0x08, layout_contiguous(x_raw, 8))])
    y_raw = f.append(struct.pack('<q', 7))
    y = object_header_v2(f, [
        (0x01, space_scalar()), (0x03, dt_i64()),
        (0x08, layout_contiguous(y_raw, 8))])
    datagrp = group_v2(f, {'data': data})
    sub = group_v2(f, {'x': x, 'y': y})
    entry = group_v2(f, {'data': datagrp, 'sub': sub})
    finish_v2(f, group_v2(f, {'entry': entry}), outdir / 'data_000001.h5')

    # master.h5 : every child of /entry/data is an external link
    f = FileBuf()
    f.alloc(48)
    datagrp = object_header_v2(f, [
        (0x02, link_info_msg()),
        (0x06, ext_link_msg('data', 'data_000001.h5', '/entry/data/data')),
        (0x06, ext_link_msg('grp', 'data_000001.h5', '/entry/sub')),
        (0x06, ext_link_msg('missing_file', 'nope.h5', '/x')),
        (0x06, ext_link_msg('missing_obj', 'data_000001.h5', '/no/such')),
    ])
    entry = group_v2(f, {'data': datagrp})
    finish_v2(f, group_v2(f, {'entry': entry}), outdir / 'master.h5')

    # A->B->A cycle: each file's /loop external-links the other's /loop
    for me, other in (('cycle_a.h5', 'cycle_b.h5'), ('cycle_b.h5', 'cycle_a.h5')):
        f = FileBuf()
        f.alloc(48)
        r = object_header_v2(f, [
            (0x02, link_info_msg()),
            (0x06, ext_link_msg('loop', other, '/loop')),
        ])
        finish_v2(f, r, outdir / me)


if __name__ == '__main__':
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else \
        Path(__file__).resolve().parent.parent / 'src/test/resources/h5'
    out.mkdir(parents=True, exist_ok=True)
    make_v0(out / 'mouse_v0.h5')
    make_v2(out / 'mouse_v2.h5')
    make_v4(out / 'mouse_v4.h5')
    make_bad_deflate(out / 'bad_deflate.h5')
    make_bad_stack(out / 'bad_stack.h5')
    make_bigendian(out / 'mouse_bigendian.h5')
    make_bad_vax(out / 'bad_vax.h5')
    make_bad_fletcher(out / 'bad_fletcher.h5')
    make_swizzle(out / 'swizzle.h5')
    make_objref(out / 'objref.h5')
    make_objref2(out / 'objref2.h5')
    make_bad_objref2(out / 'bad_objref2_ext.h5', 'external')
    make_bad_objref2(out / 'bad_objref2_token.h5', 'token')
    make_bad_objref2(out / 'bad_objref2_attrname.h5', 'attrname')
    make_attrref4(out / 'attrref4.h5')
    make_regionref(out / 'regionref.h5')
    make_regionref2(out / 'regionref2.h5')
    make_bad_regionref(out / 'bad_regionref.h5')
    make_bad_refarray(out / 'bad_refarray.h5')
    make_bad_refcompound(out / 'bad_refcompound.h5')
    make_bad_refmarker(out / 'bad_refmarker.h5')
    make_str_array(out / 'str_array.h5')
    make_extlink(out / 'extlink')
    make_vds(out / 'extlink')
    make_pipeline_tree(out / 'pipe')
    make_unlimited(out / 'mouse_unlim.h5')
    make_dense(out / 'mouse_dense.h5')
    print(f"wrote mouse_v0/v2/v4/unlim/dense, bad_deflate, str_array, "
          f"extlink/ under {out}")
