"""OpenEXR scanline image I/O, implemented from the format spec.

Covers the reference's mmimage capability
(ref: lib/rust/mmimage/src/lib.rs:39,64,142 — read metadata, read
pixels as f32x4 RGBA, write f32x4 RGBA with metadata round-trip) without
external dependencies: single-part scanline EXRs, float32/half channels,
NONE / ZIP / ZIPS compression (zlib + the EXR delta/interleave
transform).  Pixel transforms are NumPy-vectorized.
"""

import struct
import zlib

import numpy as np

_MAGIC = b"\x76\x2f\x31\x01"

# Channel pixel types.
_UINT, _HALF, _FLOAT = 0, 1, 2
_TYPE_SIZE = {_UINT: 4, _HALF: 2, _FLOAT: 4}
_TYPE_DTYPE = {
    _UINT: np.uint32,
    _HALF: np.float16,
    _FLOAT: np.float32,
}

COMPRESSION_NONE = 0
COMPRESSION_RLE = 1
COMPRESSION_ZIPS = 2
COMPRESSION_ZIP = 3
_LINES_PER_CHUNK = {
    COMPRESSION_NONE: 1,
    COMPRESSION_RLE: 1,
    COMPRESSION_ZIPS: 1,
    COMPRESSION_ZIP: 16,
}


class ExrError(Exception):
    pass


def _read_cstr(buf, pos):
    end = buf.index(b"\0", pos)
    return buf[pos:end].decode("latin-1"), end + 1


def _parse_channels(data):
    channels = []
    pos = 0
    while data[pos] != 0:
        name, pos = _read_cstr(data, pos)
        # int32 pixel type, uint8 pLinear, 3 reserved bytes, two int32
        # sampling rates = 16 bytes per channel entry.
        ptype, _plinear, xs, ys = struct.unpack_from("<iB3xii", data, pos)
        pos += 16
        channels.append({"name": name, "type": ptype,
                         "x_sampling": xs, "y_sampling": ys})
    return channels


def _pack_channels(channels):
    out = b""
    for ch in channels:
        out += ch["name"].encode("latin-1") + b"\0"
        out += struct.pack("<iB3xii", ch["type"], 0, 1, 1)
    return out + b"\0"


def read_header(file_path):
    """Read EXR attributes; returns dict name -> (type, raw bytes) plus
    parsed 'channels', 'dataWindow', 'compression'."""
    with open(file_path, "rb") as f:
        data = f.read()
    return _parse_header(data)[0]


def _parse_header(data):
    if data[:4] != _MAGIC:
        raise ExrError("not an EXR file")
    version = struct.unpack_from("<i", data, 4)[0]
    if version & 0x200:
        raise ExrError("multi-part EXR not supported")
    if version & 0x800:
        raise ExrError("deep EXR not supported")
    pos = 8
    attrs = {}
    while data[pos] != 0:
        name, pos = _read_cstr(data, pos)
        atype, pos = _read_cstr(data, pos)
        size = struct.unpack_from("<i", data, pos)[0]
        pos += 4
        attrs[name] = (atype, data[pos:pos + size])
        pos += size
    pos += 1  # header terminator

    header = {"_attrs": attrs}
    if "channels" in attrs:
        header["channels"] = _parse_channels(attrs["channels"][1])
    if "dataWindow" in attrs:
        header["dataWindow"] = struct.unpack("<4i", attrs["dataWindow"][1])
    if "displayWindow" in attrs:
        header["displayWindow"] = struct.unpack(
            "<4i", attrs["displayWindow"][1]
        )
    if "compression" in attrs:
        header["compression"] = attrs["compression"][1][0]
    if "pixelAspectRatio" in attrs:
        header["pixelAspectRatio"] = struct.unpack(
            "<f", attrs["pixelAspectRatio"][1]
        )[0]
    return header, pos


def _predictor_decode(data):
    """Shared ZIP/RLE post-transform: predictor decode + de-interleave
    (ImfZip.cpp / ImfRleCompressor.cpp apply the identical reorder)."""
    arr = np.frombuffer(data, np.uint8).astype(np.int64)
    # EXR 'predictor' decode: rec[i] = rec[i-1] + d[i] - 128 (mod 256)
    # == (cumsum(d - 128) + 128) mod 256  (ImfZip.cpp semantics).
    rec = ((np.cumsum(arr - 128) + 128) % 256).astype(np.uint8)
    # De-interleave: first half -> even positions, second -> odd.
    n = len(rec)
    half = (n + 1) // 2
    out = np.empty(n, np.uint8)
    out[0::2] = rec[:half]
    out[1::2] = rec[half:]
    return out.tobytes()


def _predictor_encode(raw):
    arr = np.frombuffer(raw, np.uint8)
    half = (len(arr) + 1) // 2
    del half
    # Interleave split.
    inter = np.concatenate([arr[0::2], arr[1::2]])
    # Delta encode with bias.
    delta = inter.astype(np.int16)
    delta[1:] = (delta[1:] - inter[:-1].astype(np.int16)) + 128
    return (delta % 256).astype(np.uint8).tobytes()


def _zip_decode(raw, expected_size):
    data = zlib.decompress(raw)
    if len(data) != expected_size:
        raise ExrError("bad chunk size after inflate")
    return _predictor_decode(data)


def _zip_encode(raw):
    return zlib.compress(_predictor_encode(raw), 6)


def _rle_uncompress(raw, expected_size):
    """EXR RLE record stream -> raw bytes (ImfRle.cpp rleUncompress):
    a signed count byte per record — negative = that many literal
    bytes follow; non-negative = repeat the next byte count+1 times."""
    out = bytearray()
    i = 0
    n = len(raw)
    while i < n and len(out) < expected_size:
        count = raw[i]
        i += 1
        if count > 127:  # signed negative: literal run
            count = 256 - count
            out += raw[i:i + count]
            i += count
        else:
            out += raw[i:i + 1] * (count + 1)
            i += 1
    if len(out) != expected_size:
        raise ExrError("bad RLE chunk")
    return bytes(out)


def _rle_decode(raw, expected_size):
    return _predictor_decode(_rle_uncompress(raw, expected_size))


def _rle_encode(raw):
    """Predictor transform + RLE record stream (ImfRle.cpp rleCompress:
    runs of >= 3 become run records; literal stretches cap at 127)."""
    data = _predictor_encode(raw)
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # Measure the run starting at i (cap at 128 repeats).
        j = i
        while j + 1 < n and data[j + 1] == data[i] and j - i < 127:
            j += 1
        run = j - i + 1
        if run >= 3:
            out.append(run - 1)
            out.append(data[i])
            i = j + 1
            continue
        # Literal stretch until a run of >= 3 starts (cap at 127).
        start = i
        while i < n and i - start < 127:
            if (i + 2 < n and data[i] == data[i + 1]
                    and data[i] == data[i + 2]):
                break
            i += 1
        count = i - start
        out.append(256 - count)
        out += data[start:i]
    return bytes(out)


def read_pixels(file_path):
    """Read an EXR; returns (image (H, W, 4) float32 RGBA, header).

    Missing channels fill with 0 (alpha 1).  Mirrors
    image_read_pixels_exr_f32x4 (ref: lib/rust/mmimage/src/lib.rs:64).
    """
    with open(file_path, "rb") as f:
        data = f.read()
    header, pos = _parse_header(data)
    xmin, ymin, xmax, ymax = header["dataWindow"]
    width = xmax - xmin + 1
    height = ymax - ymin + 1
    compression = header.get("compression", COMPRESSION_NONE)
    if compression not in _LINES_PER_CHUNK:
        raise ExrError("unsupported compression: %d" % compression)
    lines_per_chunk = _LINES_PER_CHUNK[compression]
    channels = sorted(header["channels"], key=lambda c: c["name"])
    bytes_per_line = sum(
        _TYPE_SIZE[c["type"]] * width for c in channels
    )

    num_chunks = (height + lines_per_chunk - 1) // lines_per_chunk
    offsets = struct.unpack_from("<%dQ" % num_chunks, data, pos)

    planes = {
        c["name"]: np.zeros((height, width), np.float32) for c in channels
    }
    for off in offsets:
        y, size = struct.unpack_from("<ii", data, off)
        raw = data[off + 8: off + 8 + size]
        n_lines = min(lines_per_chunk, ymax - y + 1)
        expected = bytes_per_line * n_lines
        if size < expected:
            if compression in (COMPRESSION_ZIP, COMPRESSION_ZIPS):
                raw = _zip_decode(raw, expected)
            elif compression == COMPRESSION_RLE:
                raw = _rle_decode(raw, expected)
        if len(raw) != expected:
            raise ExrError("bad chunk size")
        buf = np.frombuffer(raw, np.uint8)
        line_start = 0
        for li in range(n_lines):
            row = y - ymin + li
            chan_pos = line_start
            for c in channels:
                nbytes = _TYPE_SIZE[c["type"]] * width
                vals = np.frombuffer(
                    buf[chan_pos:chan_pos + nbytes].tobytes(),
                    _TYPE_DTYPE[c["type"]],
                )
                planes[c["name"]][row] = vals.astype(np.float32)
                chan_pos += nbytes
            line_start += bytes_per_line

    img = np.zeros((height, width, 4), np.float32)
    img[..., 3] = 1.0
    for i, name in enumerate("RGBA"):
        if name in planes:
            img[..., i] = planes[name]
    return img, header


def write_pixels(file_path, image, compression=COMPRESSION_ZIP,
                 half_precision=False, extra_attributes=None):
    """Write (H, W, 3|4) float array as scanline EXR RGBA/RGB.

    Mirrors image_write_pixels_exr_f32x4
    (ref: lib/rust/mmimage/src/lib.rs:142); extra_attributes is a dict
    name -> (type_name, raw bytes) for metadata round-trip.
    """
    image = np.asarray(image, np.float32)
    if image.ndim != 3 or image.shape[2] not in (3, 4):
        raise ValueError("image must be (H, W, 3|4)")
    height, width, nchan = image.shape
    ptype = _HALF if half_precision else _FLOAT
    dtype = _TYPE_DTYPE[ptype]
    names = ["R", "G", "B", "A"][:nchan]
    channels = [
        {"name": n, "type": ptype, "x_sampling": 1, "y_sampling": 1}
        for n in sorted(names)
    ]
    lines_per_chunk = _LINES_PER_CHUNK[compression]

    attrs = []

    def attr(name, atype, payload):
        attrs.append(
            name.encode("latin-1") + b"\0" + atype.encode("latin-1")
            + b"\0" + struct.pack("<i", len(payload)) + payload
        )

    dw = struct.pack("<4i", 0, 0, width - 1, height - 1)
    attr("channels", "chlist", _pack_channels(channels))
    attr("compression", "compression", bytes([compression]))
    attr("dataWindow", "box2i", dw)
    attr("displayWindow", "box2i", dw)
    attr("lineOrder", "lineOrder", b"\0")
    attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    attr("screenWindowCenter", "v2f", struct.pack("<2f", 0.0, 0.0))
    attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    for name, (atype, payload) in (extra_attributes or {}).items():
        attr(name, atype, payload)

    header = _MAGIC + struct.pack("<i", 2) + b"".join(attrs) + b"\0"

    # Build chunks.
    chunk_order = sorted(names)
    chan_index = {"R": 0, "G": 1, "B": 2, "A": 3}
    chunks = []
    y = 0
    while y < height:
        n_lines = min(lines_per_chunk, height - y)
        rows = []
        for li in range(n_lines):
            for cname in chunk_order:
                rows.append(
                    image[y + li, :, chan_index[cname]]
                    .astype(dtype)
                    .tobytes()
                )
        raw = b"".join(rows)
        if compression in (COMPRESSION_ZIP, COMPRESSION_ZIPS):
            packed = _zip_encode(raw)
        elif compression == COMPRESSION_RLE:
            packed = _rle_encode(raw)
        else:
            packed = raw
        if len(packed) >= len(raw):
            packed = raw
        chunks.append((y, packed))
        y += n_lines

    offset_table_pos = len(header)
    first_chunk = offset_table_pos + 8 * len(chunks)
    offsets = []
    pos = first_chunk
    for y, packed in chunks:
        offsets.append(pos)
        pos += 8 + len(packed)

    with open(file_path, "wb") as f:
        f.write(header)
        f.write(struct.pack("<%dQ" % len(offsets), *offsets))
        for (y, packed) in chunks:
            f.write(struct.pack("<ii", y, len(packed)))
            f.write(packed)
