"""Multimodal columns: image/audio/video as opaque binary + typed metadata
(training-data-pipeline extension surface).

The Spark-side plumbing is real and tested — schema, partitioning, Arrow
batch shape, mapInPandas signatures. The codec step has two modes:

- ``decode=\"fake\"`` (default) derives deterministic pseudo-features from
  the bytes themselves, so pipelines are testable end-to-end;
- ``decode=\"real\"`` parses what stdlib ``struct`` can parse — PNG IHDR
  geometry (width/height) and WAV fmt/data headers (sample rate, channels,
  duration) — and raises NotImplementedError only for formats that
  genuinely need a codec library (JPEG pixel decode, MP4), at the exact
  seam where Pillow/ffmpeg/torchaudio would plug in. Learned embeddings
  stay NULL in real mode: header decode is real, the encoder model is not
  in this container.

Scale notes: binary payloads ride Arrow batches into pandas workers —
``maxRecordsPerBatch`` bounds executor memory per batch; media tables
should be partitioned by kind/date so feature extraction jobs prune to the
modality they need. Nothing here shuffles: decode/feature-extract are
narrow mapInPandas passes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical media table layout: opaque payload + typed, modality-specific
#: metadata. Writers partition by (kind, ds).
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_s", T.DoubleType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, n_bytes long, sha256 string, width int, height int, "
    "embedding array<float>"
)

FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, frame_ts_s double"

AUDIO_FEATURES_SCHEMA = (
    "media_id long, n_bytes long, sha256 string, sample_rate int, "
    "n_channels int, duration_s double, embedding array<float>"
)

VIDEO_FEATURES_SCHEMA = (
    "media_id long, n_bytes long, sha256 string, width int, height int, "
    "duration_s double, embedding array<float>"
)


PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def parse_png_size(payload: bytes | None) -> tuple[int, int] | None:
    """(width, height) from a PNG IHDR, or None if not a PNG.

    The PNG spec fixes the layout: 8-byte signature, then the IHDR chunk
    first — length(4, BE) + b"IHDR" + width(4, BE) + height(4, BE) — so
    geometry sits at bytes 16..24 of every valid file. Pure stdlib.
    """
    import struct

    if payload is None or len(payload) < 24 or not payload.startswith(PNG_SIGNATURE):
        return None
    if payload[12:16] != b"IHDR":
        return None
    width, height = struct.unpack(">II", payload[16:24])
    return width, height


JPEG_SIGNATURE = b"\xff\xd8\xff"


def parse_jpeg_size(payload: bytes | None) -> tuple[int, int, int] | None:
    """(width, height, n_components) from a JPEG SOF marker, or None if
    not a JPEG. Walks the marker list from SOI: each segment is
    0xFF + marker(1) + length(2, BE, includes itself); geometry lives in
    the first SOFn frame header (0xC0-0xCF minus DHT 0xC4 / JPG 0xC8 /
    DAC 0xCC) as precision(1) + height(2, BE) + width(2, BE) +
    components(1). Pure stdlib — the exact shape of parse_png_size's
    IHDR read; full pixel decode stays behind the injectable codec.
    """
    import struct

    if payload is None or len(payload) < 4 or not payload.startswith(JPEG_SIGNATURE):
        return None
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            return None  # desynced marker stream — not a parseable JPEG
        # The spec allows any number of 0xFF fill bytes before the marker
        # code itself — skip padding so 0xFF is never read as a marker.
        while pos + 1 < n and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > n:
            return None
        marker = payload[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2  # standalone markers carry no length
            continue
        if marker == 0xD9:  # EOI before any SOF
            return None
        (seg_len,) = struct.unpack(">H", payload[pos + 2:pos + 4])
        if seg_len < 2:
            return None
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if pos + 9 > n:
                return None
            height, width = struct.unpack(">HH", payload[pos + 5:pos + 9])
            return width, height, payload[pos + 9] if pos + 9 < n else 0
        pos += 2 + seg_len
    return None


def parse_wav_header(
    payload: bytes | None,
) -> tuple[int, int, float] | None:
    """(sample_rate, n_channels, duration_s) from a RIFF/WAVE header, or
    None if not a WAV. Walks the chunk list (id(4) + size(4, LE) + body)
    for ``fmt `` (sample rate, channels, byte rate) and ``data`` (payload
    size → duration = data_size / byte_rate). Pure stdlib.
    """
    import struct

    if (
        payload is None
        or len(payload) < 12
        or payload[0:4] != b"RIFF"
        or payload[8:12] != b"WAVE"
    ):
        return None
    pos, rate, channels, byte_rate, data_size = 12, None, None, None, None
    while pos + 8 <= len(payload):
        chunk_id = payload[pos : pos + 4]
        (chunk_size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if chunk_id == b"fmt " and pos + 24 <= len(payload):
            channels, rate, byte_rate = struct.unpack(
                "<HII", payload[pos + 10 : pos + 20]
            )
        elif chunk_id == b"data":
            data_size = chunk_size
        pos += 8 + chunk_size + (chunk_size % 2)  # chunks are word-aligned
    if rate is None or data_size is None or not byte_rate:
        return None
    return rate, channels, data_size / byte_rate


def parse_webp_size(payload: bytes | None) -> tuple[int, int] | None:
    """(width, height) from a WebP header, or None if not a WebP. Handles
    all three first-chunk layouts the spec allows: VP8X (extended —
    24-bit LE canvas minus one), VP8L (lossless — 14-bit packed fields
    after the 0x2F signature), VP8 (lossy — 14-bit LE fields after the
    9D 01 2A sync). Pure stdlib bit arithmetic."""
    if (
        payload is None
        or len(payload) < 30
        or payload[0:4] != b"RIFF"
        or payload[8:12] != b"WEBP"
    ):
        return None
    fourcc = payload[12:16]
    body = payload[20:]
    if fourcc == b"VP8X" and len(body) >= 10:
        w = int.from_bytes(body[4:7], "little") + 1
        h = int.from_bytes(body[7:10], "little") + 1
        return w, h
    if fourcc == b"VP8L" and len(body) >= 5 and body[0] == 0x2F:
        bits = int.from_bytes(body[1:5], "little")
        return (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1
    if fourcc == b"VP8 " and len(body) >= 10 and body[3:6] == b"\x9d\x01\x2a":
        w = int.from_bytes(body[6:8], "little") & 0x3FFF
        h = int.from_bytes(body[8:10], "little") & 0x3FFF
        return w, h
    return None


def parse_flac_streaminfo(
    payload: bytes | None,
) -> tuple[int, int, float] | None:
    """(sample_rate, n_channels, duration_s) from a FLAC STREAMINFO block,
    or None if not a FLAC. Layout is fixed by the spec: 4-byte "fLaC"
    magic, then metadata blocks of 1-byte header (bit7 = last, bits 0-6 =
    type; STREAMINFO is type 0 and MUST come first) + 3-byte BE length.
    STREAMINFO packs sample rate (20 bits), channels-1 (3), bits/sample-1
    (5) and total samples (36) into the 8 bytes at offset 10 of the
    block. Pure stdlib bit shifts — the parse_wav_header shape."""
    if payload is None or len(payload) < 8 + 34 or payload[0:4] != b"fLaC":
        return None
    if payload[4] & 0x7F != 0:  # STREAMINFO must be the first block
        return None
    block = payload[8:]
    packed = int.from_bytes(block[10:18], "big")
    sample_rate = packed >> 44
    channels = ((packed >> 41) & 0x7) + 1
    total_samples = packed & ((1 << 36) - 1)
    if sample_rate == 0:
        return None
    return sample_rate, channels, total_samples / sample_rate


#: MPEG-1 Layer III bitrate table (kbit/s; index 0 = free, 15 = bad) and
#: sample-rate table — the two lookups an MP3 frame header needs.
_MP3_BITRATES = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
_MP3_RATES = (44100, 48000, 32000, 0)


def parse_mp3_header(
    payload: bytes | None,
) -> tuple[int, int, float] | None:
    """(sample_rate, n_channels, duration_s_estimate) from the first
    MPEG-1 Layer III frame header, or None if not an MP3. Skips a
    leading ID3v2 tag (syncsafe 28-bit size), then requires the 11-bit
    frame sync. Duration is the CBR estimate audio_bytes*8/bitrate —
    exact for constant-bitrate files, approximate for VBR (a real codec
    reads the Xing header; that stays at the injectable seam)."""
    if payload is None or len(payload) < 10:
        return None
    pos = 0
    if payload[0:3] == b"ID3":
        size = (
            (payload[6] & 0x7F) << 21
            | (payload[7] & 0x7F) << 14
            | (payload[8] & 0x7F) << 7
            | (payload[9] & 0x7F)
        )
        pos = 10 + size
        if payload[5] & 0x10:
            # ID3v2.4 footer flag: a 10-byte '3DI' footer follows the tag
            # body and is NOT counted in the syncsafe size — without the
            # skip the frame-sync check lands on the footer and a valid
            # file reads as not-an-MP3
            pos += 10
    if pos + 4 > len(payload):
        return None
    h = payload[pos:pos + 4]
    # sync (11 bits), MPEG-1 (bits 4-3 of byte1 == 11), Layer III (bits
    # 2-1 == 01)
    if h[0] != 0xFF or (h[1] & 0xFE) != 0xFA:
        return None
    bitrate = _MP3_BITRATES[h[2] >> 4] * 1000
    rate = _MP3_RATES[(h[2] >> 2) & 0x3]
    if not bitrate or not rate:
        return None
    channels = 1 if (h[3] >> 6) == 0b11 else 2  # mono vs stereo/joint/dual
    return rate, channels, (len(payload) - pos) * 8 / bitrate


def parse_ogg_header(
    payload: bytes | None,
) -> tuple[int, int, float] | None:
    """(sample_rate, n_channels, duration_s) from an OGG container holding
    a Vorbis or Opus stream, or None if not an OGG. The first page's
    payload is the codec id header — ``\\x01vorbis`` (channels u8 +
    sample rate u32-LE at offsets 11/12) or ``OpusHead`` (channels u8 at
    9, pre-skip u16-LE at 10, input rate u32-LE at 12). Duration comes
    from the LAST page's granule position: PCM samples for Vorbis
    (granule / rate), 48 kHz units minus pre-skip for Opus — the
    spec-defined end-of-stream bookkeeping, so no packet decode is
    needed. Pure stdlib, the parse_flac_streaminfo shape; waveform
    decode stays at the injectable codec seam.

    Duration contract: the tail scan validates page-structure bytes
    (version == 0, no reserved header-type flags) before trusting a
    capture match, so an ``OggS`` byte string inside packet PAYLOAD
    can't false-sync to a garbage granule; an invalid match continues
    the backward scan. For CHAINED Ogg files (multiple concatenated
    logical streams) the value is an ESTIMATE: it reads the last chained
    stream's final granule under the FIRST stream's codec parameters —
    exact for the common single-stream file, per-chain-segment parsing
    is the known extension."""
    import struct

    if payload is None or len(payload) < 58 or payload[0:4] != b"OggS":
        return None
    n_segs = payload[26]
    body = payload[27 + n_segs:]
    if body.startswith(b"\x01vorbis") and len(body) >= 16:
        channels = body[11]
        (rate,) = struct.unpack("<I", body[12:16])
        preskip, gr_rate = 0, rate
    elif body.startswith(b"OpusHead") and len(body) >= 16:
        channels = body[9]
        (preskip,) = struct.unpack("<H", body[10:12])
        (rate,) = struct.unpack("<I", body[12:16])
        gr_rate = 48_000  # Opus granules are ALWAYS 48 kHz units
    else:
        return None
    if not rate or not channels:
        return None
    # last page's granule position: scan capture patterns from the tail
    # (pages are unindexed; -1 granule marks a continued-packet page).
    # A match is only trusted if the page-structure bytes hold — stream
    # version must be 0 and the header-type byte has only the low three
    # flag bits (continued/BOS/EOS) defined — otherwise it's 'OggS'
    # occurring inside packet payload and the scan continues backwards.
    granule = 0
    search_end = len(payload)
    while search_end > 0:
        pos = payload.rfind(b"OggS", 0, search_end)
        if pos < 0:
            break
        if (
            pos + 14 <= len(payload)
            and payload[pos + 4] == 0  # stream_structure_version
            and payload[pos + 5] & 0xF8 == 0  # reserved flags clear
        ):
            (g,) = struct.unpack("<q", payload[pos + 6:pos + 14])
            if g >= 0:
                granule = g
                break
        search_end = pos
    duration = max(0, granule - preskip) / gr_rate
    return rate, channels, duration


def _mp4_boxes(payload: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for ISO-BMFF boxes in
    payload[start:end] — size(4 BE) + type(4); size==1 means a 64-bit
    largesize follows, size==0 means to-end-of-enclosure."""
    import struct

    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", payload[pos:pos + 4])
        btype = payload[pos + 4:pos + 8]
        body = pos + 8
        min_size = 8
        if size == 1:
            if pos + 16 > end:
                return
            (size,) = struct.unpack(">Q", payload[pos + 8:pos + 16])
            body = pos + 16
            # the largesize form occupies 16 header bytes — a declared
            # size in [8, 16) would put the body start past the box end
            # and advance the walk into the middle of the largesize field
            min_size = 16
        elif size == 0:
            size = end - pos
        if size < min_size or pos + size > end:
            return  # truncated/corrupt — stop walking
        yield btype, body, pos + size
        pos += size


def parse_mp4_header(
    payload: bytes | None,
) -> tuple[int | None, int | None, float] | None:
    """(width, height, duration_s) from an ISO-BMFF (MP4/MOV) container,
    or None if not one. Walks the box tree with stdlib struct — the
    layouts are fixed by ISO 14496-12: ``moov/mvhd`` carries
    (timescale u32, duration u32|u64) after the version/flags fullbox
    header; each ``moov/trak/tkhd`` carries 16.16-fixed width/height at
    spec-fixed offsets (76/80 for version 0, 88/92 for version 1).
    Geometry is the max across tracks (audio-only tracks encode 0x0 —
    a pure-audio MP4 yields NULL geometry with a real duration). Frame
    extraction stays behind the injectable codec seam, exactly like
    pixel decode for images."""
    import struct

    if payload is None or len(payload) < 16:
        return None
    head = payload[4:8]
    if head not in (b"ftyp", b"moov", b"mdat", b"wide", b"free", b"skip"):
        return None
    duration = None
    width = height = 0
    for btype, body, bend in _mp4_boxes(payload, 0, len(payload)):
        if btype != b"moov":
            continue
        for ctype, cbody, cend in _mp4_boxes(payload, body, bend):
            if ctype == b"mvhd" and cbody + 4 <= cend:
                ver = payload[cbody]
                if ver == 1 and cbody + 32 <= cend:
                    (ts,) = struct.unpack(">I", payload[cbody + 20:cbody + 24])
                    (dur,) = struct.unpack(">Q", payload[cbody + 24:cbody + 32])
                elif ver == 0 and cbody + 24 <= cend:
                    ts, dur = struct.unpack(">II", payload[cbody + 12:cbody + 20])
                else:
                    continue
                if ts:
                    duration = dur / ts
            elif ctype == b"trak":
                for ttype, tbody, tend in _mp4_boxes(payload, cbody, cend):
                    if ttype != b"tkhd" or tbody >= tend:
                        continue  # empty tkhd body: skip, don't IndexError
                    off = 88 if payload[tbody] == 1 else 76
                    if tbody + off + 8 <= tend:
                        w, h = struct.unpack(
                            ">II", payload[tbody + off:tbody + off + 8]
                        )
                        width = max(width, w >> 16)  # 16.16 fixed point
                        height = max(height, h >> 16)
    if duration is None:
        return None
    return (width or None, height or None, duration)


def _fake_embedding(digest: bytes, dim: int = 8) -> list[float]:
    """Deterministic unit-scale vector derived from a content digest —
    the stand-in for a real vision/audio encoder."""
    out = []
    for i in range(dim):
        chunk = digest[(i * 4) % len(digest) : (i * 4) % len(digest) + 4]
        out.append(int.from_bytes(chunk.ljust(4, b"\0"), "big") / 2**32 - 0.5)
    return out


def _decode_media(
    df: DataFrame,
    decode,
    kind: str,
    schema: str,
    feature_cols: tuple[str, ...],
    real_parse,
    real_seam_msg: str,
    fake_features,
) -> DataFrame:
    """ONE decode scaffold for all three media kinds — arg validation,
    payload digest, callable/real/fake branching, n_bytes/sha256
    assembly, cpu_parallelize + mapInPandas wiring. The kinds differ
    only in their header-parser chain (``real_parse``: bytes ->
    len(feature_cols)-tuple or None), the metadata passthrough
    (``fake_features``: pdf -> {col: Series}), and the feature column
    list; one scaffold means the null-payload tuple arity, the seam
    error discipline, and the digest conventions can never drift
    between kinds (they had already drifted once). Callable codecs
    return (*feature_cols, embedding | None)."""
    if decode not in ("fake", "real") and not callable(decode):
        raise ValueError(
            f"decode must be 'fake', 'real', or a codec callable, got {decode!r}"
        )
    n_feat = len(feature_cols)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            digests = payloads.map(
                lambda b: hashlib.sha256(b if b is not None else b"").digest()
            )
            if callable(decode):
                none_row = (None,) * (n_feat + 1)
                out = payloads.map(
                    lambda b: decode(b) if b is not None else none_row
                )
                feats = {
                    name: out.map(lambda t, i=i: t[i])
                    for i, name in enumerate(feature_cols)
                }
                embedding = out.map(lambda t: t[n_feat])
            elif decode == "real":

                def hdr(b: bytes | None) -> tuple:
                    if b is None:
                        return (None,) * n_feat
                    parsed = real_parse(b)
                    if parsed is None:
                        raise NotImplementedError(real_seam_msg)
                    return parsed

                headers = payloads.map(hdr)
                feats = {
                    name: headers.map(lambda t, i=i: t[i])
                    for i, name in enumerate(feature_cols)
                }
                embedding = pd.Series([None] * len(pdf), index=pdf.index)
            else:
                feats = fake_features(pdf)
                embedding = digests.map(_fake_embedding)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "sha256": digests.map(bytes.hex),
                    **feats,
                    "embedding": embedding,
                }
            )

    from endtoend_etl_openmeteo_spark.operators.dedup import cpu_parallelize

    rows = cpu_parallelize(df.filter(F.col("kind") == kind))
    return rows.mapInPandas(batches, schema=schema)


def _meta_col(pdf: pd.DataFrame, field: str) -> pd.Series:
    return pdf["meta"].map(lambda m: m[field] if m else None)


def decode_images(df: DataFrame, decode: str = "fake") -> DataFrame:
    """Image decode + feature extraction over Arrow batches (mapInPandas).

    ``fake`` hashes the payload into deterministic features so the pipeline
    shape (schema, batching, nullability) is fully exercised; ``real``
    parses geometry from PNG IHDR bytes (stdlib) and raises
    NotImplementedError for formats that need a pixel codec (JPEG/WebP) —
    the exact seam where Pillow/opencv would plug in. Embeddings are NULL
    in real mode: the encoder model is not in this container.

    ``decode`` may also be a CALLABLE codec — ``codec(payload) ->
    (width, height, embedding | None)`` — injected in place of the
    stdlib parser: exactly how a Pillow/opencv decoder plugs in without
    this module importing it. The codec runs inside the Arrow batch
    loop, so its exceptions surface per-batch like the built-in modes'.
    """

    def geom(b: bytes) -> tuple[int, int] | None:
        size = parse_png_size(b) or parse_webp_size(b)
        if size is None:
            jpeg = parse_jpeg_size(b)
            size = jpeg[:2] if jpeg is not None else None
        return size

    return _decode_media(
        df,
        decode,
        kind="image",
        schema=IMAGE_FEATURES_SCHEMA,
        feature_cols=("width", "height"),
        real_parse=geom,
        real_seam_msg=(
            "real pixel decode beyond PNG/JPEG/WebP headers requires an "
            "imaging library (Pillow/opencv); not available in this "
            "environment"
        ),
        fake_features=lambda pdf: {
            "width": _meta_col(pdf, "width"),
            "height": _meta_col(pdf, "height"),
        },
    )


def decode_audio(df: DataFrame, decode: str = "fake") -> DataFrame:
    """Audio decode + feature extraction over Arrow batches (mapInPandas).

    ``fake`` passes typed metadata through and derives a deterministic
    pseudo-embedding from the payload digest; ``real`` parses RIFF/WAVE,
    FLAC STREAMINFO, MPEG-1 Layer III frame headers and OGG Vorbis/Opus
    id headers (+ last-page granule for duration) with stdlib bit
    arithmetic (sample rate, channel count, duration — CBR-estimated for
    MP3) and raises NotImplementedError for formats needing a waveform
    codec (VBR-exact MP3, raw AAC) — the torchaudio/ffmpeg seam.
    Embeddings are NULL in real mode.

    ``decode`` may also be a CALLABLE codec — ``codec(payload) ->
    (sample_rate, n_channels, duration_s, embedding | None)`` — the
    torchaudio/ffmpeg injection point, same contract as decode_images'.
    """
    return _decode_media(
        df,
        decode,
        kind="audio",
        schema=AUDIO_FEATURES_SCHEMA,
        feature_cols=("sample_rate", "n_channels", "duration_s"),
        real_parse=lambda b: (
            parse_wav_header(b)
            or parse_flac_streaminfo(b)
            or parse_mp3_header(b)
            or parse_ogg_header(b)
        ),
        real_seam_msg=(
            "real audio decode beyond WAV/FLAC/MP3/OGG headers requires a "
            "codec library (torchaudio/ffmpeg); not available in this "
            "environment"
        ),
        fake_features=lambda pdf: {
            "sample_rate": _meta_col(pdf, "sample_rate"),
            "n_channels": pd.Series([1] * len(pdf), index=pdf.index),
            "duration_s": _meta_col(pdf, "duration_s"),
        },
    )


def decode_videos(df: DataFrame, decode: str = "fake") -> DataFrame:
    """Video container probe + feature extraction over Arrow batches
    (mapInPandas) — the video face of the decode_images/decode_audio
    discipline. ``fake`` passes typed metadata through with a
    digest-derived pseudo-embedding; ``real`` parses ISO-BMFF (MP4/MOV)
    box trees with stdlib struct — mvhd duration, max tkhd 16.16
    geometry across tracks — and raises NotImplementedError for
    containers needing a demuxer (MKV/WebM's EBML, raw streams) — the
    ffmpeg/pyav seam. Embeddings are NULL in real mode. ``decode`` may
    also be a CALLABLE codec: ``codec(payload) -> (width, height,
    duration_s, embedding | None)``. Frame pixel extraction composes
    downstream via :func:`sample_video_frames` (metadata-only planning).
    """
    return _decode_media(
        df,
        decode,
        kind="video",
        schema=VIDEO_FEATURES_SCHEMA,
        feature_cols=("width", "height", "duration_s"),
        real_parse=parse_mp4_header,
        real_seam_msg=(
            "real video probe beyond ISO-BMFF (MP4/MOV) headers requires "
            "a demuxer (ffmpeg/pyav); not available in this environment"
        ),
        fake_features=lambda pdf: {
            "width": _meta_col(pdf, "width"),
            "height": _meta_col(pdf, "height"),
            "duration_s": _meta_col(pdf, "duration_s"),
        },
    )


def sample_video_frames(df: DataFrame, fps: float = 1.0) -> DataFrame:
    """Frame-sampling plan for video rows: which frame indices/timestamps a
    decoder would extract, at ``fps`` frames/second of media time.

    The INDEX ARITHMETIC is real (pure JVM: sequence over duration); only
    pixel extraction is deferred to the decode seam. This split matters at
    scale — planning frames is a narrow transform over metadata and never
    touches payload bytes.
    """
    videos = df.filter(F.col("kind") == "video").select(
        "media_id", F.col("meta.duration_s").alias("duration_s")
    )
    n_frames = F.greatest(
        F.floor(F.col("duration_s") * F.lit(fps)).cast("int"), F.lit(1)
    )
    return videos.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).select(
        "media_id",
        "frame_idx",
        (F.col("frame_idx") / F.lit(fps)).alias("frame_ts_s"),
    )


def plan_audio_windows(
    df: DataFrame, window_s: float = 5.0, hop_s: float = 2.5
) -> DataFrame:
    """Overlapping analysis-window plan for audio rows (the STFT/encoder
    front-end shape): window/hop arithmetic over (duration_s, sample_rate)
    metadata. Like sample_video_frames, the index math is real JVM work and
    the waveform decode stays behind the codec seam — the plan never
    touches payload bytes, so at scale it is a narrow metadata transform.

    Windows tile the media at ``hop_s`` stride up to the first window whose
    end reaches the media end (ceil((duration - window) / hop) + 1 windows,
    minimum one); that final window truncates at the media end. No window
    starts beyond it — a start inside the media but past the last full
    window would only re-cover already-windowed samples.
    """
    audio = df.filter(F.col("kind") == "audio").select(
        "media_id",
        F.col("meta.duration_s").alias("duration_s"),
        F.col("meta.sample_rate").alias("sample_rate"),
    )
    last_idx = F.greatest(
        F.ceil((F.col("duration_s") - F.lit(window_s)) / F.lit(hop_s)).cast("int"),
        F.lit(0),
    )
    start = F.col("win_idx") * F.lit(hop_s)
    end = F.least(start + F.lit(window_s), F.col("duration_s"))
    return (
        audio.select(
            "media_id",
            "duration_s",
            "sample_rate",
            F.explode(F.sequence(F.lit(0), last_idx)).alias("win_idx"),
        )
        .select(
            "media_id",
            "win_idx",
            start.alias("start_s"),
            end.alias("end_s"),
            F.round((end - start) * F.col("sample_rate")).cast("long").alias(
                "n_samples"
            ),
        )
    )
