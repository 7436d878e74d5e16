"""Multimodal columns: binary payloads + typed metadata, REAL decode
for stdlib-expressible formats, explicit stubs for the rest.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct. The Spark-side schema, partitioning, Arrow batch
shape, and UDF signatures are real and tested, and so is the decode
path for formats the sandbox can express without external libraries:

- **PPM (P6) images**: parsed/encoded in pure numpy (`decode_ppm` /
  `encode_ppm`); feature extraction (channel moments + luminance
  histogram) and nearest-neighbor resize operate on real pixels;
- **WAV audio**: stdlib ``wave`` decode (`decode_wav`); features are
  duration / RMS / zero-crossing rate / peak + band energies;
- **YUV4MPEG2 (y4m) video**: pure-numpy container decode
  (`decode_y4m`); real frame sampling (`frame_sample_videos` emits
  sampled frames as PPM payloads that feed the image operators
  unchanged) and real features (frame count / fps / luminance moments /
  temporal-difference energy / histogram).

JPEG/PNG and codec video (h264/vp9/...) need PIL/ffmpeg. Those are
AUTO-DETECTED where the decode actually runs (inside each Python
worker): ``decode_image`` falls through to PIL when it is importable,
``decode_audio``/``decode_video`` shell out to an ffmpeg binary found
on PATH — installing either on the executors lights the path up with
no code change. Every operator also takes an explicit ``decoder=``
injection point (pickled into the UDF closure, so it reaches the
workers) for custom runtimes and for testing the dispatch without the
libraries. With neither available, non-stdlib payloads raise an
explicit NotImplementedError unless ``deterministic_fake=True``
(hash-seeded fakes keep downstream plumbing testable); the mapInPandas
batch shape never changes between the real, injected, and fake paths.
"""

from __future__ import annotations

import hashlib
import io
import wave

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURE_DIM = 16
AUDIO_FEATURE_DIM = 16


# -- real codecs (stdlib/numpy only) ------------------------------------

def encode_ppm(arr: np.ndarray) -> bytes:
    """uint8 (h, w, 3) -> binary PPM (P6)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = a.shape[0], a.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) -> uint8 (h, w, 3). Pure numpy, handles comments."""
    if not payload or not payload.startswith(b"P6"):
        raise NotImplementedError(
            "real decode of non-PPM images requires PIL/cv2 (not in this "
            "sandbox); pass deterministic_fake=True for the plumbing path"
        )
    # header: magic, width, height, maxval — whitespace/comment separated
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            i = payload.index(b"\n", i) + 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        fields.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only maxval=255 PPM supported")
    return np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i).reshape(
        h, w, 3
    )


def encode_wav(samples: np.ndarray, framerate: int = 8000) -> bytes:
    """int16 mono samples -> WAV bytes (stdlib wave)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(framerate)
        wf.writeframes(np.ascontiguousarray(samples, dtype=np.int16).tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float64 mono samples in [-1, 1], framerate)."""
    if not payload or payload[:4] != b"RIFF":
        raise NotImplementedError(
            "real decode of non-WAV audio requires ffmpeg (not in this "
            "sandbox); pass deterministic_fake=True for the plumbing path"
        )
    with wave.open(io.BytesIO(payload), "rb") as wf:
        n, ch, width, rate = (
            wf.getnframes(), wf.getnchannels(), wf.getsampwidth(), wf.getframerate()
        )
        raw = wf.readframes(n)
    if width != 2:
        raise ValueError("only 16-bit WAV supported")
    s = np.frombuffer(raw, dtype=np.int16).astype(np.float64) / 32768.0
    if ch > 1:
        s = s.reshape(-1, ch).mean(axis=1)
    return s, rate


def encode_y4m(frames: np.ndarray, fps: int = 10) -> bytes:
    """uint8 (n_frames, h, w) grayscale -> YUV4MPEG2 (Cmono) bytes.
    Y4M is a plain uncompressed container: text header + raw planes, so
    it round-trips in pure numpy — the video analog of PPM."""
    f = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w = f.shape
    head = b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 Cmono\n" % (w, h, fps)
    body = b"".join(b"FRAME\n" + f[i].tobytes() for i in range(n))
    return head + body


def decode_y4m(payload: bytes) -> tuple[np.ndarray, float]:
    """YUV4MPEG2 (Cmono) bytes -> (uint8 (n, h, w) frames, fps)."""
    if not payload or not payload.startswith(b"YUV4MPEG2"):
        raise NotImplementedError(
            "real decode of codec video (h264/vp9/...) requires ffmpeg "
            "(not in this sandbox); uncompressed YUV4MPEG2 decodes for "
            "real — pass deterministic_fake=True for other formats"
        )
    nl = payload.index(b"\n")
    w = h = 0
    fps = 25.0
    colorspace = "420"
    for tok in payload[10:nl].split():
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F":
            num, den = val.split(b":")
            fps = int(num) / int(den)
        elif tag == b"C":
            colorspace = val.decode()
    if colorspace != "mono":
        raise ValueError("only Cmono YUV4MPEG2 supported in-sandbox")
    frames = []
    i = nl + 1
    fsz = w * h
    while i < len(payload):
        j = payload.index(b"\n", i)  # FRAME line (may carry params)
        if not payload[i:j].startswith(b"FRAME"):
            raise ValueError("malformed y4m frame header")
        frames.append(
            np.frombuffer(payload, dtype=np.uint8, count=fsz, offset=j + 1).reshape(h, w)
        )
        i = j + 1 + fsz
    return np.stack(frames) if frames else np.zeros((0, h, w), np.uint8), fps


# -- optional-dependency decode dispatch (auto-detect PIL / ffmpeg) ------

def pil_image_decoder():
    """A JPEG/PNG/... -> uint8 (h, w, 3) decoder backed by PIL when it
    is importable, else None. Called where the decode runs (inside the
    Python worker), so installing Pillow on the executors enables real
    decode with no code change."""
    try:
        from PIL import Image
    except ImportError:
        return None

    def dec(payload: bytes) -> np.ndarray:
        return np.asarray(
            Image.open(io.BytesIO(payload)).convert("RGB"), dtype=np.uint8
        )

    return dec


def ffmpeg_audio_decoder():
    """Any-container audio decode via an ffmpeg binary on PATH:
    payload -> (float64 mono samples in [-1, 1], 16000). None when
    ffmpeg is absent (auto-detected per worker)."""
    import shutil as _sh

    if not _sh.which("ffmpeg"):
        return None

    def dec(payload: bytes) -> tuple[np.ndarray, int]:
        import subprocess

        out = subprocess.run(
            ["ffmpeg", "-v", "error", "-i", "pipe:0",
             "-f", "s16le", "-ac", "1", "-ar", "16000", "pipe:1"],
            input=payload, stdout=subprocess.PIPE, check=True,
        ).stdout
        return np.frombuffer(out, np.int16).astype(np.float64) / 32768.0, 16000

    return dec


def ffmpeg_video_decoder():
    """Codec video decode via an ffmpeg binary on PATH: any codec ->
    grayscale yuv4mpegpipe, re-fed through the pure-numpy decode_y4m.
    None when ffmpeg is absent (auto-detected per worker)."""
    import shutil as _sh

    if not _sh.which("ffmpeg"):
        return None

    def dec(payload: bytes) -> tuple[np.ndarray, float]:
        import subprocess

        out = subprocess.run(
            ["ffmpeg", "-v", "error", "-i", "pipe:0",
             "-f", "yuv4mpegpipe", "-pix_fmt", "gray", "pipe:1"],
            input=payload, stdout=subprocess.PIPE, check=True,
        ).stdout
        return decode_y4m(out)

    return dec


def decode_image(payload: bytes, decoder=None) -> np.ndarray:
    """Image decode dispatch: PPM in pure numpy everywhere; other
    formats through ``decoder`` when injected (a model runtime, a test
    fake), else PIL auto-detected in the worker, else the explicit
    stub error."""
    if payload and payload.startswith(b"P6"):
        return decode_ppm(payload)
    dec = decoder or pil_image_decoder()
    if dec is not None:
        return dec(payload)
    return decode_ppm(payload)  # raises the canonical NotImplementedError


def decode_audio(payload: bytes, decoder=None) -> tuple[np.ndarray, int]:
    """Audio decode dispatch: WAV via stdlib everywhere; other formats
    through ``decoder`` when injected, else ffmpeg auto-detected in the
    worker, else the explicit stub error."""
    if payload and payload[:4] == b"RIFF":
        return decode_wav(payload)
    dec = decoder or ffmpeg_audio_decoder()
    if dec is not None:
        return dec(payload)
    return decode_wav(payload)  # raises the canonical NotImplementedError


def decode_video(payload: bytes, decoder=None) -> tuple[np.ndarray, float]:
    """Video decode dispatch: YUV4MPEG2 in pure numpy everywhere; codec
    formats through ``decoder`` when injected, else ffmpeg auto-detected
    in the worker, else the explicit stub error."""
    if payload and payload.startswith(b"YUV4MPEG2"):
        return decode_y4m(payload)
    dec = decoder or ffmpeg_video_decoder()
    if dec is not None:
        return dec(payload)
    return decode_y4m(payload)  # raises the canonical NotImplementedError


def _synth_y4m(media_id: int, seed: int) -> tuple[bytes, int, int, int]:
    fps = 10
    n = 3 + (media_id * 11 + seed) % 6
    w, h = 16 + (media_id * 5) % 16, 12 + (media_id * 7) % 16
    x = np.arange(w)[None, :] + np.arange(h)[:, None]
    frames = np.stack([((x + 3 * i + media_id) * 9) % 256 for i in range(n)]).astype(
        np.uint8
    )
    dur_ms = int(n * 1000 / fps)
    return encode_y4m(frames, fps), w, h, dur_ms


def _synth_ppm(media_id: int, seed: int) -> tuple[bytes, int, int]:
    rng = np.random.RandomState((media_id * 2654435761 + seed) & 0x7FFFFFFF)
    w, h = int(rng.randint(8, 24)), int(rng.randint(8, 24))
    x = np.arange(w)[None, :] + np.arange(h)[:, None] + media_id
    img = np.stack(
        [(x * 7) % 256, (x * 13) % 256, (x * 29) % 256], axis=-1
    ).astype(np.uint8)
    return encode_ppm(img), w, h


def _synth_wav(media_id: int, seed: int) -> tuple[bytes, int]:
    rate = 8000
    dur_ms = 100 + (media_id * 37 + seed) % 400
    t = np.arange(int(rate * dur_ms / 1000))
    freq = 100.0 + (media_id % 40) * 20.0
    samples = (np.sin(2 * np.pi * freq * t / rate) * 12000).astype(np.int16)
    return encode_wav(samples, rate), dur_ms


def synth_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic media table with REAL payloads: PPM images and WAV
    audio (both decodable in-sandbox), opaque fake bytes for video.
    Pure function of (media_id, seed) — partition-independent."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                kind = ("image", "audio", "video")[mid % 3]
                if kind == "image":
                    payload, w, h = _synth_ppm(mid, seed)
                    meta = (w, h, None, "image/x-portable-pixmap")
                elif kind == "audio":
                    payload, dur = _synth_wav(mid, seed)
                    meta = (None, None, dur, "audio/wav")
                elif mid % 2 == 0:
                    # even video ids: REAL uncompressed y4m payloads
                    payload, w, h, dur = _synth_y4m(mid, seed)
                    meta = (w, h, dur, "video/x-yuv4mpeg")
                else:
                    # odd video ids: opaque codec bytes (the stub path)
                    payload = hashlib.sha256(f"{seed}:{mid}".encode()).digest()
                    meta = (
                        16 + (mid * 31) % 1920, 16 + (mid * 17) % 1080,
                        1000 + (mid * 97) % 60000, "video/x-fake",
                    )
                rows.append((mid, kind, payload, meta))
            yield pd.DataFrame(
                {
                    "media_id": [r[0] for r in rows],
                    "kind": [r[1] for r in rows],
                    "payload": [r[2] for r in rows],
                    "meta": [
                        {
                            "width": r[3][0], "height": r[3][1],
                            "duration_ms": r[3][2], "mime": r[3][3],
                        }
                        for r in rows
                    ],
                }
            )

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


def _fake_image_features(payload: bytes, dim: int = IMAGE_FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for decode+embed of formats the sandbox
    cannot decode (JPEG/PNG): hash-seeded unit vector. REPLACE with real
    decode (PIL -> resize -> model) in prod."""
    h = hashlib.sha256(payload or b"").digest()
    rng = np.random.RandomState(np.frombuffer(h[:4], dtype=np.uint32)[0])
    v = rng.standard_normal(dim)
    return v / np.linalg.norm(v)


def _real_image_features(
    payload: bytes, dim: int = IMAGE_FEATURE_DIM, decoder=None
) -> np.ndarray:
    """REAL pixel features from a decodable payload (PPM everywhere,
    JPEG/PNG via PIL/injected decoder): per-channel mean/std +
    luminance histogram (dim-6 bins)."""
    rgb = decode_image(payload, decoder).astype(np.float64) / 255.0
    means, stds = rgb.mean(axis=(0, 1)), rgb.std(axis=(0, 1))
    lum = rgb @ np.array([0.299, 0.587, 0.114])
    hist, _ = np.histogram(lum, bins=dim - 6, range=(0.0, 1.0))
    return np.concatenate([means, stds, hist / lum.size])


def extract_image_features(
    df: DataFrame,
    deterministic_fake: bool = False,
    dim: int = IMAGE_FEATURE_DIM,
    decoder=None,
) -> DataFrame:
    """mapInPandas feature extraction over image payloads.

    PPM payloads are decoded FOR REAL (numpy); other formats decode via
    ``decoder`` / auto-detected PIL (see decode_image) and otherwise
    raise the explicit stub error unless ``deterministic_fake=True``.
    Batch shape: input (media_id, payload), output (media_id, features
    array<float>). Partitioning is preserved — no shuffle; at scale the
    binary column is the IO bound, so repartition the source by file
    size before calling if batches skew."""

    def one(p):
        try:
            return _real_image_features(p, dim, decoder)
        except Exception:
            # non-PPM (NotImplementedError) or CORRUPT payload (bad
            # header / truncated pixels): one bad document must not be
            # able to kill the job when the caller opted into fakes
            if deterministic_fake:
                return _fake_image_features(p, dim)
            raise

    def run(batches):
        for pdf in batches:
            feats = [one(p).astype(np.float32).tolist() for p in pdf["payload"]]
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    src = df.filter(F.col("kind") == "image").select("media_id", "payload")
    return src.mapInPandas(run, "media_id long, features array<float>")


def _audio_features(
    payload: bytes, dim: int = AUDIO_FEATURE_DIM, decoder=None
) -> np.ndarray:
    """REAL audio features from a decodable payload (WAV everywhere,
    other containers via ffmpeg/injected decoder): duration, RMS,
    zero-crossing rate, peak + (dim-4) FFT band energies."""
    s, rate = decode_audio(payload, decoder)
    if s.size == 0:
        return np.zeros(dim)
    dur = s.size / rate
    rms = float(np.sqrt(np.mean(s * s)))
    zcr = float(np.mean(np.signbit(s[1:]) != np.signbit(s[:-1])))
    peak = float(np.abs(s).max())
    mag = np.abs(np.fft.rfft(s))
    bands = np.array_split(mag, dim - 4)
    be = np.array([float(b.sum()) for b in bands])
    tot = be.sum() or 1.0
    return np.concatenate([[dur, rms, zcr, peak], be / tot])


def extract_audio_features(
    df: DataFrame, dim: int = AUDIO_FEATURE_DIM, decoder=None
) -> DataFrame:
    """mapInPandas audio feature extraction (stdlib WAV decode, real
    samples; other containers via ffmpeg/injected decoder)."""

    def run(batches):
        for pdf in batches:
            feats = [
                _audio_features(p, dim, decoder).astype(np.float32).tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    src = df.filter(F.col("kind") == "audio").select("media_id", "payload")
    return src.mapInPandas(run, "media_id long, features array<float>")


def resize_ppm(payload: bytes, max_side: int = 512, decoder=None) -> bytes:
    """REAL nearest-neighbor resize of a decodable image payload (numpy
    indexing), applying the same geometry as resize_plan; output is
    always PPM."""
    img = decode_image(payload, decoder)
    h, w = img.shape[0], img.shape[1]
    scale = min(float(max_side) / max(w, h), 1.0)
    tw, th = max(int(np.ceil(w * scale)), 1), max(int(np.ceil(h * scale)), 1)
    ys = np.minimum((np.arange(th) / scale).astype(np.int64), h - 1)
    xs = np.minimum((np.arange(tw) / scale).astype(np.int64), w - 1)
    return encode_ppm(img[ys][:, xs])


def resize_images(df: DataFrame, max_side: int = 512, decoder=None) -> DataFrame:
    """mapInPandas real resize for decodable payloads -> PPM payload col."""

    def run(batches):
        for pdf in batches:
            out = [resize_ppm(p, max_side, decoder) for p in pdf["payload"]]
            yield pd.DataFrame({"media_id": pdf["media_id"], "payload": out})

    src = df.filter(F.col("kind") == "image").select("media_id", "payload")
    return src.mapInPandas(run, "media_id long, payload binary")


def frame_sample_videos(
    df: DataFrame,
    every_ms: int = 1000,
    deterministic_fake: bool = False,
    decoder=None,
) -> DataFrame:
    """REAL video frame sampling over y4m payloads: decode, pick the
    frame nearest each ``every_ms`` timestamp, emit each sampled frame
    as a PPM payload (grayscale replicated to RGB) so every downstream
    image operator — real resize, real feature extraction — applies
    unchanged. Codec formats decode via ``decoder`` / auto-detected
    ffmpeg (see decode_video) and otherwise raise the explicit stub
    error unless ``deterministic_fake=True`` (one hash-fake frame per
    timestamp). Batch shape: (media_id, payload) -> (media_id,
    frame_ts_ms, frame_ppm binary); mapInPandas, partitioning
    preserved."""

    def run(batches):
        for pdf in batches:
            ids, tss, frames = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    fr, fps = decode_video(p, decoder)
                except NotImplementedError:
                    if not deterministic_fake:
                        raise
                    fr, fps = None, 1.0
                if fr is None:
                    n_fake = 3
                    for k in range(n_fake):
                        h = hashlib.sha256((p or b"") + bytes([k])).digest()
                        g = np.frombuffer((h * 48)[: 12 * 16], np.uint8).reshape(12, 16)
                        ids.append(int(mid)); tss.append(k * every_ms)
                        frames.append(encode_ppm(np.stack([g, g, g], axis=-1)))
                    continue
                dur_ms = len(fr) * 1000.0 / fps
                t = 0
                while t < dur_ms:
                    idx = min(int(round(t * fps / 1000.0)), len(fr) - 1)
                    g = fr[idx]
                    ids.append(int(mid)); tss.append(int(t))
                    frames.append(encode_ppm(np.stack([g, g, g], axis=-1)))
                    t += every_ms
            if ids:  # an all-codec batch yields nothing (empty pandas
                # columns infer float64, which Arrow can't cast to the
                # declared list/binary types)
                yield pd.DataFrame(
                    {"media_id": ids, "frame_ts_ms": tss, "frame_ppm": frames}
                )

    src = df.filter(F.col("kind") == "video").select("media_id", "payload")
    return src.mapInPandas(run, "media_id long, frame_ts_ms long, frame_ppm binary")


VIDEO_FEATURE_DIM = 12


def extract_video_features(
    df: DataFrame, dim: int = VIDEO_FEATURE_DIM, decoder=None
) -> DataFrame:
    """REAL video features from decodable payloads (y4m everywhere,
    codecs via ffmpeg/injected decoder): frame count, fps, luminance
    mean/std, temporal-difference energy + (dim-5) luminance histogram
    bins over all frames."""

    def one(p):
        fr, fps = decode_video(p, decoder)
        lum = fr.astype(np.float64) / 255.0
        tdiff = (
            float(np.abs(np.diff(lum, axis=0)).mean()) if len(fr) > 1 else 0.0
        )
        hist, _ = np.histogram(lum, bins=dim - 5, range=(0.0, 1.0))
        return np.concatenate(
            [
                [float(len(fr)), float(fps), float(lum.mean()), float(lum.std()), tdiff],
                hist / max(lum.size, 1),
            ]
        )

    def run(batches):
        for pdf in batches:
            out_ids, feats = [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    feats.append(one(p).astype(np.float32).tolist())
                    out_ids.append(int(mid))
                except NotImplementedError:
                    continue  # codec videos: skip (no real decode here)
            if out_ids:  # see frame_sample_videos: empty batches stay unyielded
                yield pd.DataFrame({"media_id": out_ids, "features": feats})

    src = df.filter(F.col("kind") == "video").select("media_id", "payload")
    return src.mapInPandas(run, "media_id long, features array<float>")


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: computes the frame timestamps to
    extract per video from metadata (JVM-side); pair with
    ``frame_sample_videos`` for the real pixel extraction (y4m) or a
    production ffmpeg UDF (codecs)."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


def resize_plan(df: DataFrame, max_side: int = 512) -> DataFrame:
    """Resize geometry (scale factor + target dims) computed JVM-side;
    the pixel work is the stubbed decode step."""
    w, h = F.col("meta.width").cast("double"), F.col("meta.height").cast("double")
    scale = F.least(F.lit(float(max_side)) / F.greatest(w, h), F.lit(1.0))
    return df.filter(F.col("kind") == "image").select(
        "media_id",
        F.round(scale, 6).alias("scale"),
        F.ceil(w * scale).cast("int").alias("target_w"),
        F.ceil(h * scale).cast("int").alias("target_h"),
    )
