"""Real pure-Python media codecs: PNG (RFC 2083 / ISO 15948), WAV
(RIFF PCM), and Y4M (YUV4MPEG2) video.  No external libraries — PNG
rides on stdlib ``zlib`` for DEFLATE and ``numpy`` for scanline math;
WAV/Y4M are ``struct``/header parsing + numpy.  (Baseline JPEG lives in
its own module, ``jpeg.py``.)

These close the "stub codec" seam called out in round-4 review: the
multimodal decode/resize/frame-extract operators (``multimodal.py``)
sniff payload magic bytes and route PPM, PNG, JPEG, WAV, and Y4M
payloads through REAL codecs; only unrecognized formats fall through to
the clearly-marked deterministic fake.

Scope (deliberately the subset a training-data pipeline meets):

- PNG: 8-bit depth, color types 0 (gray), 2 (RGB), 6 (RGBA);
  non-interlaced; all five filter types (None/Sub/Up/Average/Paeth) on
  decode; encoder can emit any per-row filter so tests exercise every
  unfilter path.  Chunk CRCs are verified on decode.
- WAV: canonical RIFF/WAVE, PCM (format 1), 16-bit samples, any
  channel count / sample rate.
- Y4M: C444 (exact round trip) and C420 subsampled planar frames;
  frame extraction is O(1) pointer arithmetic off the fixed frame
  stride — sampling frames from a clip never decodes the clip.

Scale note: these run inside Arrow-batched ``mapInPandas`` tasks
(multimodal.py), one payload at a time — per-task memory is one image /
one clip, independent of partition size.  The unfilter hot loops are
vectorized where the filter's data dependence allows (None/Sub/Up are
whole-row numpy ops; Average/Paeth are sequential in x by definition —
the same dependence every native decoder has).

Reference parity: the reference engine stores image embeds as opaque
blobs and never decodes (/root/reference/src/subscription.ts:23-31);
decode here is north-star extension surface, not a port.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

#: Decompression-bomb guard for the COMPRESSED formats (PNG/GIF/JPEG):
#: a few-KB payload whose header declares huge dimensions forces the
#: decoder to allocate h*w-sized arrays (PNG inflates ~1000x, GIF LZW
#: ~2700x, and JPEG allocated its coefficient planes from the SOF dims
#: before reading any entropy data) — an OOM no per-record quarantine
#: can catch because the task dies before raising.  PIL draws the same
#: line (MAX_IMAGE_PIXELS + DecompressionBombError).  Raw formats
#: (WAV/Y4M/PPM) need no cap: their memory is bounded by the payload
#: size itself.
#:
#: The budget is on the decoder's WORKING SET, not on output pixels
#: (review r11): the output is uint8, but PNG unfiltering runs through
#: int64 scan+recon buffers (~18 B/sample) and JPEG through float64
#: coefficient planes plus full-res upsampled copies (~17 B/pixel per
#: component), so a pixel-only cap understates peak memory by an order
#: of magnitude.  Each call site passes its format's true transient
#: bytes/pixel; the pixel ceiling stays as a coarse backstop.
MAX_DECODE_PIXELS = 1 << 27
MAX_DECODE_BYTES = 512 << 20


def _check_pixel_budget(w: int, h: int, fmt: str, bytes_per_pixel: int = 4) -> None:
    px = w * h
    if px > MAX_DECODE_PIXELS or px * bytes_per_pixel > MAX_DECODE_BYTES:
        raise ValueError(
            f"{fmt}: declared {w}x{h} = {px} pixels (~{px * bytes_per_pixel} "
            f"working bytes at {bytes_per_pixel} B/px) exceeds the decode "
            f"budget of {MAX_DECODE_PIXELS} pixels / {MAX_DECODE_BYTES} "
            f"bytes (decompression-bomb guard)"
        )
WAV_MAGIC = b"RIFF"

# color type -> samples per pixel (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


# --------------------------------------------------------------------------
# PNG
# --------------------------------------------------------------------------

def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def png_encode(arr, filters=None, level: int = 6) -> bytes:
    """uint8 array -> PNG bytes.

    ``arr`` is (h, w) gray, (h, w, 3) RGB, or (h, w, 4) RGBA.
    ``filters`` optionally gives the per-row filter type (0..4, int or
    sequence, default all-0); rows are filtered accordingly before
    DEFLATE, so tests can force every decoder unfilter path.
    """
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 3, 4):
        raise ValueError(f"unsupported array shape {np.asarray(arr).shape}")
    h, w, ch = a.shape
    color_type = {1: 0, 3: 2, 4: 6}[ch]
    if filters is None:
        frow = [0] * h
    elif isinstance(filters, int):
        frow = [filters] * h
    else:
        frow = list(filters)
        if len(frow) != h:
            raise ValueError(f"filters length {len(frow)} != height {h}")

    bpp = ch  # bytes per pixel at 8-bit depth
    rows = a.reshape(h, w * ch).astype(np.int64)
    prev = np.zeros(w * ch, dtype=np.int64)
    out = bytearray()
    for y in range(h):
        cur = rows[y]
        ft = frow[y]
        if ft == 0:
            filt = cur
        elif ft == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, dtype=np.int64), cur[:-bpp]])
            filt = cur - left
        elif ft == 2:  # Up
            filt = cur - prev
        elif ft == 3:  # Average
            left = np.concatenate([np.zeros(bpp, dtype=np.int64), cur[:-bpp]])
            filt = cur - (left + prev) // 2
        elif ft == 4:  # Paeth
            left = np.concatenate([np.zeros(bpp, dtype=np.int64), cur[:-bpp]])
            ul = np.concatenate([np.zeros(bpp, dtype=np.int64), prev[:-bpp]])
            filt = cur - _paeth_predictor(left, prev, ul)
        else:
            raise ValueError(f"bad filter type {ft}")
        out.append(ft)
        out += (filt % 256).astype(np.uint8).tobytes()
        prev = cur

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(out), level))
        + _chunk(b"IEND", b"")
    )


def _paeth_predictor(a, b, c):
    """Vectorized Paeth predictor (RFC 2083 §6.6) over int64 arrays."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def png_decode(payload: bytes, verify_crc: bool = True):
    """PNG bytes -> (width, height, channels, (h, w, ch) uint8 array).

    Supports 8-bit gray/RGB/RGBA, non-interlaced, all filter types.
    Raises ValueError on malformed input or unsupported features.
    """
    if not payload.startswith(PNG_MAGIC):
        raise ValueError("not a PNG payload")
    pos, n = len(PNG_MAGIC), len(payload)
    ihdr = None
    idat = bytearray()
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk body")
        if pos + 12 + length > n:
            # chunk cut inside its 4-byte CRC: without this guard the
            # unpack below leaked struct.error past the documented
            # ValueError contract
            raise ValueError("truncated chunk CRC")
        if verify_crc:
            (crc,) = struct.unpack(
                ">I", payload[pos + 8 + length : pos + 12 + length]
            )
            if crc != (zlib.crc32(tag + body) & 0xFFFFFFFF):
                raise ValueError(f"bad CRC in {tag!r} chunk")
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG: depth={depth} comp={comp} filter={filt} "
            f"interlace={interlace}"
        )
    ch = _PNG_CHANNELS.get(color_type)
    if ch is None:
        raise ValueError(f"unsupported color type {color_type}")
    # ~18 B/sample transient: 1 B raw inflate + 8 B int64 scan + 8 B
    # int64 recon + 1 B uint8 output, all live at once during unfilter
    _check_pixel_budget(w, h, "PNG", bytes_per_pixel=18 * ch)

    stride = w * ch
    expected = h * (stride + 1)
    try:
        # bounded inflate: cap at expected+1 so a crafted few-KB stream
        # declaring tiny dims but expanding to GBs (a decompression
        # bomb) cannot OOM the task before the size check below —
        # anything past `expected` bytes is malformed regardless
        d = zlib.decompressobj()
        raw = d.decompress(bytes(idat), expected + 1)
    except zlib.error as ex:
        raise ValueError(f"bad IDAT stream: {ex}") from ex
    if len(raw) != expected or (d.unconsumed_tail or not d.eof):
        raise ValueError(f"IDAT size {len(raw)}+ != expected {expected}")
    data = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = data[:, 0]
    scan = data[:, 1:].astype(np.int64)
    bpp = ch

    recon = np.zeros((h, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        ft = int(ftypes[y])
        cur = scan[y]
        if ft == 0:
            row = cur
        elif ft == 1:  # Sub: per-lane prefix sum mod 256
            row = cur.reshape(-1, bpp).cumsum(axis=0).reshape(-1) % 256
        elif ft == 2:  # Up
            row = (cur + prev) % 256
        elif ft == 3:  # Average: sequential in x
            row = np.empty(stride, dtype=np.int64)
            for x in range(stride):
                left = row[x - bpp] if x >= bpp else 0
                row[x] = (cur[x] + (left + prev[x]) // 2) % 256
        elif ft == 4:  # Paeth: sequential in x
            row = np.empty(stride, dtype=np.int64)
            for x in range(stride):
                a = row[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (cur[x] + pred) % 256
        else:
            raise ValueError(f"bad filter type {ft} in scanline {y}")
        recon[y] = row
        prev = row

    px = recon.astype(np.uint8).reshape(h, w, ch)
    return w, h, ch, px


# --------------------------------------------------------------------------
# WAV (RIFF PCM16)
# --------------------------------------------------------------------------

def wav_encode(samples, sample_rate: int, channels: int = 1) -> bytes:
    """int16 sample array -> canonical RIFF/WAVE PCM bytes.

    ``samples`` is 1-D (interleaved if multi-channel) or (n, channels).
    """
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 2:
        channels = s.shape[1]
        s = s.reshape(-1)
    data = s.tobytes()
    byte_rate = sample_rate * channels * 2
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(payload: bytes):
    """WAV bytes -> (sample_rate, channels, (n, channels) int16 array).

    PCM16 only; raises ValueError otherwise.  Walks RIFF sub-chunks, so
    extra chunks (LIST, fact, ...) are tolerated.
    """
    if not payload.startswith(WAV_MAGIC) or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= n:
        tag = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"truncated {tag!r} chunk")
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            data = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, channels, rate, _byte_rate, _block, bits = fmt
    if audio_fmt != 1 or bits != 16 or channels < 1:
        # channels == 0 is malformed, not "mono-ish": accepting it
        # returned a channel count contradicting the sample shape and
        # fed a zero divisor to any frames/duration computation
        raise ValueError(
            f"unsupported WAV: format={audio_fmt} bits={bits} "
            f"channels={channels}"
        )
    s = np.frombuffer(data, dtype="<i2")
    if channels > 1:
        s = s[: (len(s) // channels) * channels].reshape(-1, channels)
    else:
        s = s.reshape(-1, 1)
    return rate, channels, s


# --------------------------------------------------------------------------
# Y4M (YUV4MPEG2) — the public uncompressed video interchange format
# (mjpegtools; what ffmpeg pipes rawvideo through). Planar frames behind
# a text header; fixed frame size makes frame extraction PURE POINTER
# ARITHMETIC — the property that matters for sampling frames out of a
# 100 TB video corpus without decoding whole clips.
# --------------------------------------------------------------------------

Y4M_MAGIC = b"YUV4MPEG2"


def y4m_encode(frames, rate=(25, 1), colorspace: str = "C444") -> bytes:
    """(n, h, w, 3) uint8 planar-encodable frames -> Y4M bytes.

    C444: three full-resolution planes per frame (exact round trip).
    C420jpeg: chroma subsampled 2x2 by box averaging (even dims only).
    Channel semantics are the container's (Y'CbCr planes); callers doing
    RGB work convert explicitly — the container does not."""
    a = np.asarray(frames, dtype=np.uint8)
    if a.ndim != 4 or a.shape[3] != 3:
        raise ValueError(f"expected (n, h, w, 3) uint8, got {a.shape}")
    n, h, w, _ = a.shape
    if colorspace == "C420jpeg" and (h % 2 or w % 2):
        raise ValueError("C420jpeg requires even dimensions")
    head = b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 %s\n" % (
        w, h, rate[0], rate[1], colorspace.encode()
    )
    out = bytearray(head)
    for f in range(n):
        out += b"FRAME\n"
        y, cb, cr = a[f, :, :, 0], a[f, :, :, 1], a[f, :, :, 2]
        out += y.tobytes()
        if colorspace == "C444":
            out += cb.tobytes() + cr.tobytes()
        else:  # C420jpeg box-average subsample
            for c in (cb, cr):
                c4 = c.reshape(h // 2, 2, w // 2, 2).astype(np.uint32)
                out += ((c4.sum(axis=(1, 3)) + 2) // 4).astype(np.uint8).tobytes()
    return bytes(out)


def _y4m_header(payload: bytes):
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(Y4M_MAGIC):
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    fn, fd = 25, 1
    cs = "C420jpeg"  # spec default
    for tok in payload[len(Y4M_MAGIC):nl].split():
        t = tok.decode("ascii", "replace")
        if t.startswith("W"):
            w = int(t[1:])
        elif t.startswith("H"):
            h = int(t[1:])
        elif t.startswith("F"):
            fn, fd = (int(x) for x in t[1:].split(":"))
        elif t.startswith("C"):
            cs = t
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    if cs not in ("C444", "C420jpeg", "C420mpeg2", "C420"):
        raise ValueError(f"unsupported Y4M colorspace {cs}")
    ysz = w * h
    csz = ysz if cs == "C444" else (w // 2) * (h // 2)
    return w, h, (fn, fd), cs, nl + 1, ysz + 2 * csz


def y4m_frame_count(payload: bytes) -> int:
    w, h, _rate, _cs, data0, fsz = _y4m_header(payload)
    per = len(b"FRAME\n") + fsz
    return (len(payload) - data0) // per


def y4m_extract_frame(payload: bytes, idx: int):
    """O(1)-seek extraction of frame ``idx``: header parse + pointer
    arithmetic, touching only that frame's bytes. Returns an
    (h, w, 3) uint8 array (C420 chroma upsampled by replication)."""
    w, h, _rate, cs, data0, fsz = _y4m_header(payload)
    per = len(b"FRAME\n") + fsz
    start = data0 + idx * per
    if idx < 0 or start + per > len(payload):
        raise ValueError(f"frame {idx} out of range")
    if payload[start : start + 6] != b"FRAME\n":
        raise ValueError(f"bad frame marker at frame {idx}")
    raw = payload[start + 6 : start + 6 + fsz]
    ysz = w * h
    y = np.frombuffer(raw[:ysz], dtype=np.uint8).reshape(h, w)
    if cs == "C444":
        cb = np.frombuffer(raw[ysz : 2 * ysz], dtype=np.uint8).reshape(h, w)
        cr = np.frombuffer(raw[2 * ysz :], dtype=np.uint8).reshape(h, w)
    else:
        hw, hh = w // 2, h // 2
        cb = np.frombuffer(raw[ysz : ysz + hw * hh], dtype=np.uint8).reshape(hh, hw)
        cr = np.frombuffer(raw[ysz + hw * hh :], dtype=np.uint8).reshape(hh, hw)
        cb = np.repeat(np.repeat(cb, 2, axis=0), 2, axis=1)[:h, :w]
        cr = np.repeat(np.repeat(cr, 2, axis=0), 2, axis=1)[:h, :w]
    return np.stack([y, cb, cr], axis=-1)


def y4m_decode(payload: bytes):
    """Full decode: (width, height, rate, (n, h, w, 3) uint8 frames)."""
    w, h, rate, _cs, _data0, _fsz = _y4m_header(payload)
    n = y4m_frame_count(payload)
    if n == 0:
        # a header-only stream is VALID Y4M with zero frames — return
        # an empty (0, h, w, 3) array instead of letting np.stack([])
        # raise and quarantine a well-formed payload as corrupt
        return w, h, rate, np.empty((0, h, w, 3), dtype=np.uint8)
    frames = np.stack([y4m_extract_frame(payload, i) for i in range(n)])
    return w, h, rate, frames


# --------------------------------------------------------------------------
# GIF (GIF89a) — indexed-color images behind LZW compression (the public
# CompuServe spec; LZW per Welch 1984). Completes the common-image-format
# set: PNG (DEFLATE), JPEG (DCT+Huffman), PPM (raw), GIF (LZW).
# Scope: single-frame, non-interlaced, global color table; the encoder
# emits fully valid variable-width LZW (with dictionary growth and CLEAR
# resets), the decoder handles any conformant stream.
# --------------------------------------------------------------------------

GIF_MAGIC = b"GIF8"


def gif_encode(indices, palette) -> bytes:
    """(h, w) uint8 index array + (n<=256, 3) palette -> GIF89a bytes."""

    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    if idx.ndim != 2:
        raise ValueError(f"expected (h, w) index array, got {idx.shape}")
    if pal.ndim != 2 or pal.shape[1] != 3 or len(pal) > 256:
        raise ValueError(f"bad palette shape {pal.shape}")
    h, w = idx.shape
    # palette size must be a power of two >= 2
    bits = max(1, int(len(pal) - 1).bit_length())
    size = 1 << bits
    table = np.zeros((size, 3), dtype=np.uint8)
    table[: len(pal)] = pal
    if int(idx.max(initial=0)) >= len(pal):
        raise ValueError("index out of palette range")

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1) << 4 | (bits - 1), 0, 0)
    out += table.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)  # image descriptor

    # ---- LZW encode (variable code width, CLEAR resets) ----
    min_code = max(2, bits)
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    acc = 0
    nbits = 0
    data = bytearray()

    def emit(code, width):
        nonlocal acc, nbits
        acc |= code << nbits  # GIF packs LSB-first
        nbits += width
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh_dict():
        return {bytes([i]): i for i in range(1 << min_code)}

    d = fresh_dict()
    next_code = eoi + 1
    width = min_code + 1
    emit(clear, width)
    seq = b""
    for v in idx.reshape(-1).tobytes():
        cand = seq + bytes([v])
        if cand in d:
            seq = cand
            continue
        emit(d[seq], width)
        d[cand] = next_code
        next_code += 1
        if next_code == (1 << width) + 1:
            if width < 12:
                width += 1
            else:
                emit(clear, width)
                d = fresh_dict()
                next_code = eoi + 1
                width = min_code + 1
        seq = bytes([v])
    if seq:
        emit(d[seq], width)
        # Mirror the decoder's bookkeeping for the final data code: the
        # decoder appends one table entry after every data code past the
        # first and grows the code width when its table fills, so EOI must
        # be written at the grown width or the streams desync (a decoder
        # would read EOI at width+1 and run off the end of the stream).
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
    emit(eoi, width)
    if nbits:
        data.append(acc & 0xFF)

    out.append(min_code)
    for i in range(0, len(data), 255):
        block = data[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def gif_decode(payload: bytes):
    """GIF bytes -> (width, height, (h, w) uint8 indices, (n, 3) palette,
    (h, w, 3) uint8 RGB). Single-frame, non-interlaced."""

    if not payload.startswith(GIF_MAGIC):
        raise ValueError("not a GIF payload")
    pos = 6
    w, h, flags, _bg, _ar = struct.unpack("<HHBBB", payload[pos : pos + 7])
    pos += 7
    palette = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        palette = np.frombuffer(
            payload[pos : pos + 3 * n], dtype=np.uint8
        ).reshape(n, 3).copy()
        pos += 3 * n

    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer
            raise ValueError("no image data before trailer")
        if b == 0x21:  # extension: skip sub-blocks
            pos += 1  # label
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected block 0x{b:02X}")
        left, top, iw, ih, iflags = struct.unpack("<HHHHB", payload[pos : pos + 9])
        pos += 9
        # ~6 B/pixel transient: LZW out bytearray + idx copy + RGB(A)
        # palette expansion
        _check_pixel_budget(iw, ih, "GIF", bytes_per_pixel=6)
        if iflags & 0x40:
            raise ValueError("interlaced GIF not supported")
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            palette = np.frombuffer(
                payload[pos : pos + 3 * n], dtype=np.uint8
            ).reshape(n, 3).copy()
            pos += 3 * n
        if palette is None:
            raise ValueError("no color table")
        min_code = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos] != 0:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1

        # ---- LZW decode ----
        clear, eoi = 1 << min_code, (1 << min_code) + 1
        acc = 0
        nbits = 0
        dpos = 0
        width = min_code + 1

        def read_code():
            nonlocal acc, nbits, dpos
            while nbits < width:
                if dpos >= len(data):
                    raise ValueError("truncated LZW stream")
                acc |= data[dpos] << nbits
                dpos += 1
                nbits += 8
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            return code

        table = [bytes([i]) for i in range(1 << min_code)] + [b"", b""]
        out = bytearray()
        prev = None
        while True:
            code = read_code()
            if code == clear:
                table = table[: eoi + 1]
                width = min_code + 1
                prev = None
                continue
            if code == eoi:
                break
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError(f"bad LZW code {code}")
            out += entry
            if len(out) > iw * ih:
                # bound the output DURING the loop: a crafted stream can
                # otherwise expand far past the declared dimensions (the
                # LZW analog of a decompression bomb) before the final
                # size check ever runs
                raise ValueError(
                    f"decoded more than {iw * ih} pixels before EOI"
                )
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
        if len(out) != iw * ih:
            raise ValueError(f"decoded {len(out)} pixels, expected {iw * ih}")
        idx = np.frombuffer(bytes(out), dtype=np.uint8).reshape(ih, iw)
        rgb = palette[idx]
        return iw, ih, idx, palette, rgb
    raise ValueError("no image block found")
