"""Multimodal column plumbing (north-star X5).

Images / audio / video are opaque `binary` payload columns with typed
metadata. The Spark-side plumbing (schema, partitioning, Arrow batch
shape through mapInPandas) is real and tested; decoding is real for
container formats parseable from raw bytes (BMP image headers, RIFF/
WAVE audio headers — pure struct reads in `decode_payload`, no media
libs needed), and falls back to `decode_stub`, a clearly-marked
deterministic fake, for formats that would need PIL/libav (absent in
this container). Swapping the fallback body for PIL/libav calls is
the only change needed for full coverage.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, n_frames int, "
    "fmt string, digest string"
)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary payload column (here: utf-8 bytes
    of the text; in production: image/audio bytes from the source)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def payload_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata extraction on the binary column — expression
    level, no decode: byte length + content digest."""
    return df.withColumn("n_bytes", F.octet_length(F.col(payload_col)).cast("long")).withColumn(
        "digest", F.md5(F.col(payload_col))
    )


def decode_stub(payload: bytes) -> tuple[int, int, int]:
    """STUB — deterministic fake decode for formats needing real media
    libs (`PIL.Image.open` / libav frame iteration; absent in this
    container): fake (width, height, n_frames) derived from the byte
    length. NotImplementedError is NOT raised so the Arrow plumbing
    stays exercisable end-to-end."""
    n = len(payload)
    return (n % 640 + 1, (n * 7) % 480 + 1, n // 1000 + 1)


def decode_payload(payload: bytes) -> tuple[int, int, int, str]:
    """(width, height, n_frames, fmt) for one payload.

    REAL header decode for byte-parseable containers:

    - BMP  → (pixel width, pixel height, 1, 'bmp') from the
      BITMAPINFOHEADER int32s at offsets 18/22 (absolute value: a
      negative height encodes top-down row order). Gated on the DIB
      header size field at offset 14 being ≥ 40: a BITMAPCOREHEADER
      (OS/2, size 12) stores 16-bit dimensions at 18/20, so the int32
      reads would return garbage — those fall back to the stub.
    - PNG  → (width, height, 1, 'png') from the mandatory-first IHDR
      chunk's big-endian int32s at offsets 16/20.
    - GIF  → (width, height, 1, 'gif') from the logical screen
      descriptor's uint16s at offsets 6/8 (GIF87a/GIF89a).
    - WAV  → (sample_rate, n_channels, n_sample_frames, 'wav') from the
      RIFF chunk walk ('fmt ' for rate/channels/block-align, 'data'
      size / block-align = frame count; chunks are word-aligned).

    Anything else falls back to the deterministic fake with
    fmt='other' (see decode_stub).
    """
    if (
        payload[:2] == b"BM"
        and len(payload) >= 26
        and int.from_bytes(payload[14:18], "little") >= 40
    ):
        width = int.from_bytes(payload[18:22], "little", signed=True)
        height = int.from_bytes(payload[22:26], "little", signed=True)
        return abs(width), abs(height), 1, "bmp"
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
        # IHDR is mandatory-first: width/height are the big-endian
        # int32s at offsets 16/20.
        width = int.from_bytes(payload[16:20], "big")
        height = int.from_bytes(payload[20:24], "big")
        return width, height, 1, "png"
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        # logical screen descriptor: uint16 LE width/height at 6/8;
        # frame count would need a full block walk — report 1 (the
        # screen), same single-image convention as BMP.
        width = int.from_bytes(payload[6:8], "little")
        height = int.from_bytes(payload[8:10], "little")
        return width, height, 1, "gif"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        sample_rate = channels = block_align = n_frames = 0
        off = 12
        while off + 8 <= len(payload):
            cid = payload[off : off + 4]
            size = int.from_bytes(payload[off + 4 : off + 8], "little")
            body = payload[off + 8 : off + 8 + size]
            if cid == b"fmt " and size >= 16:
                channels = int.from_bytes(body[2:4], "little")
                sample_rate = int.from_bytes(body[4:8], "little")
                block_align = int.from_bytes(body[12:14], "little")
            elif cid == b"data":
                n_frames = size // block_align if block_align else 0
            off += 8 + size + (size & 1)
        return sample_rate, channels, n_frames, "wav"
    w, h, f = decode_stub(payload)
    return w, h, f, "other"


def decode_batch(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Arrow-batched decode over mapInPandas — the real 100 TB shape:
    each executor pulls column batches, decodes rows vectorized-ish,
    emits a typed frame. Partitioning/ordering of the input is
    preserved; batch size governed by
    spark.sql.execution.arrow.maxRecordsPerBatch."""
    import hashlib

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            meta = [decode_payload(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "n_frames": [m[2] for m in meta],
                    "fmt": [m[3] for m in meta],
                    "digest": [hashlib.md5(bytes(p)).hexdigest() for p in payloads],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(decode, schema=DECODED_SCHEMA)


def frame_sample(df: DataFrame, payload_col: str = "payload", chunk: int = 1024) -> DataFrame:
    """Treat the payload as a frame container and sample fixed-size
    chunks ("frames") — expression-level chunking, demonstrating
    array-of-binary column handling."""
    frames = F.expr(
        f"transform(sequence(0, int((octet_length({payload_col}) - 1) / {chunk})), "
        f"i -> substring({payload_col}, i * {chunk} + 1, {chunk}))"
    )
    return df.withColumn("frames", frames).withColumn("n_frames", F.size("frames"))


IMG_FEATURES_SCHEMA = (
    "doc_id long, width int, height int, mean_r double, mean_g double, "
    "mean_b double, thumb_digest string, decoded boolean"
)


def _bmp_pixels(payload: bytes):
    """numpy HxWx3 RGB array for an uncompressed (BI_RGB) 24-bit BMP,
    or None for anything else. Pure struct/numpy work — this is a REAL
    pixel decode, no media libs: rows are 4-byte aligned, stored
    bottom-up for positive heights, channels BGR."""
    import struct

    import numpy as np

    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    data_off = struct.unpack_from("<I", payload, 10)[0]
    dib = struct.unpack_from("<I", payload, 14)[0]
    if dib < 40:
        return None
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return None
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    if data_off + stride * h > len(payload):
        return None
    raw = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=data_off)
    rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1]  # BGR -> RGB


def _png_pixels(payload: bytes):
    """numpy HxWx3 RGB array for an 8-bit non-interlaced PNG (color
    types 0 grayscale / 2 RGB / 6 RGBA — alpha dropped), or None.
    REAL decode with only the stdlib: chunk walk, IDAT concatenation,
    zlib inflate, then per-row reconstruction of all five PNG filters
    (None/Sub/Up/Average/Paeth). Palette, 16-bit, and Adam7 payloads
    fall back (return None) — they'd need tables this container's
    scope doesn't justify; the labeled fallback keeps them visible."""
    import zlib

    import numpy as np

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, w = 8, 0
    h = bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        size = int.from_bytes(payload[pos : pos + 4], "big")
        cid = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"IHDR" and size >= 13:
            w = int.from_bytes(body[0:4], "big")
            h = int.from_bytes(body[4:8], "big")
            bit_depth, color_type, interlace = body[8], body[9], body[12]
        elif cid == b"IDAT":
            idat += body
        elif cid == b"IEND":
            break
        pos += 12 + size  # length + type + crc
    channels = {0: 1, 2: 3, 6: 4}.get(color_type)
    if not (w and h and idat) or bit_depth != 8 or channels is None or interlace:
        return None
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    bpp = channels  # bytes per pixel at depth 8
    stride = w * bpp
    if len(raw) < h * (stride + 1):
        return None
    out = bytearray()
    prev = bytearray(stride)
    p = 0
    for _ in range(h):
        flt = raw[p]
        row = bytearray(raw[p + 1 : p + 1 + stride])
        p += 1 + stride
        if flt == 1:  # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif flt == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif flt == 3:  # Average
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif flt == 4:  # Paeth
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                q = a + b - c
                pa, pb, pc = abs(q - a), abs(q - b), abs(q - c)
                row[i] = (row[i] + (a if pa <= pb and pa <= pc else b if pb <= pc else c)) & 0xFF
        elif flt != 0:
            return None  # corrupt filter byte
        out += row
        prev = row
    px = np.frombuffer(bytes(out), dtype=np.uint8).reshape(h, w, channels)
    if channels == 1:
        px = np.repeat(px, 3, axis=2)
    return px[:, :, :3].copy()


def _ppm_pixels(payload: bytes):
    """numpy HxWx3 RGB array for a binary P6 PPM (maxval ≤ 255), or
    None. Netpbm headers are whitespace-token based with '#' comments;
    the raster follows the single whitespace byte after maxval."""
    import numpy as np

    if payload[:2] != b"P6":
        return None
    toks, pos, n = [], 2, len(payload)
    while len(toks) < 3 and pos < n:
        c = payload[pos : pos + 1]
        if c == b"#":
            while pos < n and payload[pos] not in b"\r\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            start = pos
            while pos < n and not payload[pos : pos + 1].isspace():
                pos += 1
            toks.append(payload[start:pos])
    try:
        w, h, maxval = (int(t) for t in toks)
    except ValueError:
        return None
    pos += 1  # exactly one whitespace byte after maxval
    if maxval > 255 or w <= 0 or h <= 0 or pos + w * h * 3 > n:
        return None
    return (
        np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
        .reshape(h, w, 3)
        .copy()
    )


def _tga_pixels(payload: bytes):
    """numpy HxWx3 RGB array for an uncompressed 24-bit true-color TGA
    (image type 2), or None. TGA has no magic number, so the gate is
    strict: type/bpp/dims must be coherent AND the payload length must
    equal header + id + raster exactly — arbitrary bytes can't pass."""
    import numpy as np

    if len(payload) < 18:
        return None
    id_len, cmap_type, img_type = payload[0], payload[1], payload[2]
    w = int.from_bytes(payload[12:14], "little")
    h = int.from_bytes(payload[14:16], "little")
    bpp, desc = payload[16], payload[17]
    if (
        cmap_type != 0
        or img_type != 2
        or bpp != 24
        or w == 0
        or h == 0
        or len(payload) != 18 + id_len + w * h * 3
    ):
        return None
    raw = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=18 + id_len)
    px = raw.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if not desc & 0x20:  # origin bit clear = bottom-up storage
        px = px[::-1]
    return px.copy()


def decode_pixels(payload: bytes):
    """Dispatch a payload to the matching REAL pixel decoder (BMP,
    PNG, PPM, TGA — all stdlib/numpy, no media libs) or None when no
    decoder claims it. TGA last: it has no magic, only the strict
    length gate."""
    for dec in (_bmp_pixels, _png_pixels, _ppm_pixels, _tga_pixels):
        px = dec(payload)
        if px is not None:
            return px
    return None


def image_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    thumb: int = 4,
) -> DataFrame:
    """Pixel-level feature extraction + resize over the Arrow batch
    path: for decodable payloads (24-bit BI_RGB BMP, 8-bit PNG via
    stdlib zlib, binary PPM, uncompressed TGA — real numpy decodes,
    `decode_pixels`) emit per-channel means and the md5 of a
    ``thumb``×``thumb`` nearest-neighbor thumbnail (the dedupable
    perceptual fingerprint); undecodable payloads keep the row with
    ``decoded=false`` and null features, so corpus audits see every
    document. Swapping `decode_pixels` for a PIL call extends coverage
    without touching the Spark plumbing."""
    import hashlib

    import numpy as np

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                px = decode_pixels(bytes(p))
                if px is None:
                    out.append((int(did), None, None, None, None, None, None, False))
                    continue
                h, w = px.shape[:2]
                means = px.reshape(-1, 3).mean(axis=0)
                # nearest-neighbor resize: index grid sampling
                yi = (np.arange(thumb) * h // thumb).astype(int)
                xi = (np.arange(thumb) * w // thumb).astype(int)
                tb = px[np.ix_(yi, xi)]
                out.append(
                    (
                        int(did), int(w), int(h),
                        float(means[0]), float(means[1]), float(means[2]),
                        hashlib.md5(tb.tobytes()).hexdigest(), True,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "width", "height", "mean_r", "mean_g", "mean_b",
                    "thumb_digest", "decoded",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(feats, schema=IMG_FEATURES_SCHEMA)


def synth_bmp_payload(
    df: DataFrame, id_col: str = "doc_id", group_mod: int = 250, size: int = 16
) -> DataFrame:
    """Deterministic synthetic 24-bit BMP payload per row — the fixture
    image corpus this sandbox's test tables lack (documents carry no
    real media; SURVEY.md X5 note). Pixels derive from md5(id %
    group_mod), so ids sharing a residue render NEAR-IDENTICAL images
    (a per-id low-bit perturbation keeps them non-equal) — planted
    near-dup structure for the perceptual-hash pipeline downstream,
    which is fully real (decode_pixels -> dHash -> banded pairs).
    Arrow mapInPandas, row-local, no shuffle."""
    import hashlib
    import struct

    import numpy as np

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf[id_col]:
                gid = int(did) % group_mod
                # counter-mode md5: size*size*3 INDEPENDENT bytes per
                # group (a single tiled digest would repeat every row,
                # collapsing dHash to 8 distinct bit-rows)
                need = size * size * 3
                blocks = [
                    hashlib.md5(f"{gid}:{i}".encode()).digest()
                    for i in range((need + 15) // 16)
                ]
                rng = np.frombuffer(b"".join(blocks)[:need], dtype=np.uint8)
                base = rng.reshape(size, size, 3).astype(np.int64)
                # per-id +/-1 perturbation on one channel: near, not equal
                px = np.clip(base + (int(did) // group_mod) % 2, 0, 255).astype(np.uint8)
                # 24-bit BI_RGB bottom-up BMP, rows padded to 4 bytes
                row_bytes = (size * 3 + 3) // 4 * 4
                img = bytearray()
                for r in range(size - 1, -1, -1):
                    row = px[r, :, ::-1].tobytes()  # BGR order
                    img += row + b"\x00" * (row_bytes - len(row))
                header = struct.pack(
                    "<2sIHHIIiiHHIIiiII",
                    b"BM", 54 + len(img), 0, 0, 54, 40, size, size,
                    1, 24, 0, len(img), 2835, 2835, 0, 0,
                )
                payloads.append(header + bytes(img))
            out = pdf[[id_col]].copy()
            out["payload"] = payloads
            yield out

    return df.select(id_col).mapInPandas(render, schema=f"{id_col} long, payload binary")


def image_dhash(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """64-bit difference hash (dHash) per decodable image: grayscale,
    9x8 nearest-neighbor resize, bit (r*8+c) = grad sign between
    horizontally adjacent cells — the classic perceptual fingerprint
    whose Hamming distance tracks visual similarity. Arrow mapInPandas
    over the REAL pixel decoders (decode_pixels); undecodable payloads
    are dropped (audit them with image_features, which keeps every
    row). Pair the output with dedup.hamming_pairs — the same banded
    machinery as text SimHash, which is the point: one near-dup engine,
    many fingerprint sources."""
    import numpy as np

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                px = decode_pixels(bytes(p))
                if px is None:
                    continue
                gray = px.astype(np.float64).mean(axis=2)
                h, w = gray.shape
                yi = (np.arange(8) * h // 8).astype(int)
                xi = (np.arange(9) * w // 9).astype(int)
                g = gray[np.ix_(yi, xi)]
                bits = (g[:, 1:] > g[:, :-1]).flatten()  # row-major r*8+c
                v = 0
                for i, b in enumerate(bits):
                    if b:
                        v |= 1 << i
                if v >= 1 << 63:
                    v -= 1 << 64  # two's-complement into a signed long
                out.append((int(did), v))
            yield pd.DataFrame(out, columns=[id_col, "dhash"])

    return df.select(id_col, payload_col).mapInPandas(
        hashes, schema=f"{id_col} long, dhash long"
    )


def synth_wav_payload(
    df: DataFrame,
    id_col: str = "doc_id",
    sample_rate: int = 8000,
    n_samples: int = 4000,
    silent_mod: int = 5,
) -> DataFrame:
    """Deterministic synthetic 16-bit mono PCM WAV payload per row —
    the fixture audio corpus this sandbox lacks (same convention as
    synth_bmp_payload). Samples derive from counter-mode md5 of the id
    (loud everywhere, RMS ≈ 4700 at the ±64-scaled byte amplitude);
    ids with id % silent_mod == 0 get TWO planted all-zero spans at
    samples [800, 1120) and [2400, 2880) — frames 5–6 and 15–17 at the
    160-sample frame size audio_silence_spans uses — so silence
    detection has ground truth. Arrow mapInPandas, row-local."""
    import hashlib
    import struct

    import numpy as np

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf[id_col]:
                need = n_samples
                blocks = [
                    hashlib.md5(f"wav:{int(did)}:{i}".encode()).digest()
                    for i in range((need + 15) // 16)
                ]
                raw = np.frombuffer(b"".join(blocks)[:need], dtype=np.uint8)
                samples = ((raw.astype(np.int32) - 128) * 64).astype(np.int16)
                if int(did) % silent_mod == 0:
                    samples = samples.copy()
                    samples[800:1120] = 0
                    samples[2400:2880] = 0
                data = samples.tobytes()
                hdr = struct.pack(
                    "<4sI4s4sIHHIIHH4sI",
                    b"RIFF", 36 + len(data), b"WAVE",
                    b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16,
                    b"data", len(data),
                )
                payloads.append(hdr + data)
            out = pdf[[id_col]].copy()
            out["payload"] = payloads
            yield out

    return df.select(id_col).mapInPandas(render, schema=f"{id_col} long, payload binary")


def audio_silence_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_samples: int = 160,
    rms_threshold: float = 100.0,
) -> DataFrame:
    """Silence-span detection over 16-bit PCM WAV payloads: REAL RIFF
    chunk walk (same layout rules as decode_meta), frame the samples
    into non-overlapping ``frame_samples`` windows, RMS per frame,
    merge consecutive sub-threshold frames into (start_frame,
    end_frame) spans — the VAD-style segmentation verb an audio
    training pipeline runs before transcription/chunking. Undecodable
    or non-16-bit payloads emit nothing. Arrow mapInPandas, row-local,
    no shuffle; output is span rows (id, start_frame, end_frame,
    n_frames)."""
    import numpy as np

    def spans(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                p = bytes(payload)
                if p[:4] != b"RIFF" or p[8:12] != b"WAVE":
                    continue
                bits = block_align = 0
                data = b""
                off = 12
                while off + 8 <= len(p):
                    cid = p[off : off + 4]
                    size = int.from_bytes(p[off + 4 : off + 8], "little")
                    body = p[off + 8 : off + 8 + size]
                    if cid == b"fmt " and size >= 16:
                        block_align = int.from_bytes(body[12:14], "little")
                        bits = int.from_bytes(body[14:16], "little")
                    elif cid == b"data":
                        data = body
                    off += 8 + size + (size & 1)
                if bits != 16 or block_align != 2 or not data:
                    continue
                samples = np.frombuffer(
                    data[: len(data) // 2 * 2], dtype="<i2"
                ).astype(np.float64)
                n_frames = len(samples) // frame_samples
                if not n_frames:
                    continue
                frames = samples[: n_frames * frame_samples].reshape(
                    n_frames, frame_samples
                )
                rms = np.sqrt((frames * frames).mean(axis=1))
                silent = rms < rms_threshold
                start = None
                for i, s in enumerate(silent):
                    if s and start is None:
                        start = i
                    elif not s and start is not None:
                        out.append((int(did), start, i - 1, i - start))
                        start = None
                if start is not None:
                    out.append((int(did), start, n_frames - 1, n_frames - start))
            yield pd.DataFrame(
                out, columns=[id_col, "start_frame", "end_frame", "n_frames"]
            )

    return df.select(id_col, payload_col).mapInPandas(
        spans,
        schema=f"{id_col} long, start_frame int, end_frame int, n_frames int",
    )
