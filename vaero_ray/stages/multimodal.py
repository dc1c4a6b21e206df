"""Multimodal columns: images/audio as opaque ``binary`` columns with
typed metadata, processed by ACTOR-POOL ``map_batches`` stages.

The container has no image/audio codecs (no PIL/ffmpeg), so the actual
pixel/sample decode is stubbed: each stage tries the real library once in
``__init__`` (actor setup, not per batch) and otherwise falls back to a
DETERMINISTIC fake decoder over our own payload format. Everything
Ray-side — schemas, batch sizing for large binaries, actor signatures,
output layout — is real and tested.

Payload format (``make_fake_media``): ``b"VXIMG" + width:u16 + height:u16
+ channels:u8 + seed-derived pseudo-pixel bytes``. The fake decoder
parses the header and computes features from the byte stream; a real
deployment swaps ``_decode_real`` in without touching the pipeline.

Scale notes: media rows are KBs-to-MBs, so stages run with small
``batch_size`` (callers pass e.g. 64) and an actor pool
(``concurrency=(1, N)``) so codec/model setup happens once per actor.
Feature outputs drop the payload column — downstream shuffles never move
bytes.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import ray.data as rd

MAGIC = b"VXIMG"
MEDIA_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("media", pa.large_binary()),
        ("media_type", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


def _doc_seed(tbl: pa.Table, text_col: str) -> np.ndarray:
    """Per-row deterministic seed = polynomial text fingerprint (the
    SQL-reproducible textstats hash), so every derived payload property
    has a closed form a DuckDB oracle can recompute from ``text``."""
    from vaero_ray.stages.textstats import fingerprint

    return np.asarray(
        fingerprint(tbl.select([text_col]), text_col, "__fp").column("__fp").to_numpy(zero_copy_only=False)
    ).astype(np.int64)


def make_fake_media(tbl: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Deterministic binary media payload per row: ``VXIMG`` header +
    pixel bytes ``pixel[i] = (seed + i) % 256`` where
    ``seed = fingerprint(text)``, ``w = 16 + seed % 48``,
    ``h = 16 + (seed // 48) % 48``, 3 channels. The payload is REAL
    opaque bytes to the pipeline; the closed form exists so the gate's
    SQL oracle can recompute the decoded features from first principles."""
    ids = tbl.column(id_col).to_pylist()
    seeds = _doc_seed(tbl, text_col)
    widths = (16 + seeds % 48).astype(np.int64)
    heights = (16 + (seeds // 48) % 48).astype(np.int64)
    payloads = []
    for seed, w, hh in zip(seeds.tolist(), widths.tolist(), heights.tolist()):
        c = 3
        pixels = ((seed + np.arange(w * hh * c, dtype=np.int64)) % 256).astype(np.uint8).tobytes()
        payloads.append(MAGIC + struct.pack("<HHB", w, hh, c) + pixels)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "media": pa.array(payloads, pa.large_binary()),
            "media_type": pa.array(["image/vx-fake"] * len(ids), pa.string()),
            "width": pa.array(widths.astype(np.int32), pa.int32()),
            "height": pa.array(heights.astype(np.int32), pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


def _parse_header(buf: bytes) -> tuple[int, int, int, bytes]:
    if not buf.startswith(MAGIC):
        raise ValueError("not a VXIMG payload")
    w, h, c = struct.unpack("<HHB", buf[5:10])
    return w, h, c, buf[10:]


class ImageFeatures:
    """Actor-pool stage: decode -> per-image features.

    Usage: ``ds.map_batches(ImageFeatures, batch_size=64,
    concurrency=(1, 4), batch_format="pyarrow")``. Setup (codec probe)
    runs once per actor in __init__.
    """

    def __init__(self):
        # codec probe once per actor: PIL handles real image bytes when
        # present; VXIMG payloads always take the deterministic fake path
        try:
            from PIL import Image

            self._pil = Image
        except ImportError:  # this container: no PIL
            self._pil = None

    def _decode(self, buf: bytes) -> tuple[int, int, np.ndarray]:
        if buf.startswith(MAGIC):
            w, h, c, pix = _parse_header(buf)
            arr = np.frombuffer(pix, dtype=np.uint8).reshape(h, w, c)
            return w, h, arr
        if self._pil is not None:  # real codec path (PNG/JPEG/...)
            import io

            img = self._pil.open(io.BytesIO(buf))
            arr = np.asarray(img.convert("RGB") if img.mode not in ("RGB", "L") else img)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            return arr.shape[1], arr.shape[0], arr
        raise NotImplementedError(
            "non-VXIMG payload and no PIL in this environment: install pillow "
            "for the real codec path"
        )

    def __call__(self, tbl: pa.Table) -> pa.Table:
        ids, ws, hs, chans, sums, sumsqs = [], [], [], [], [], []
        for doc_id, buf in zip(tbl.column("doc_id").to_pylist(), tbl.column("media").to_pylist()):
            w, h, arr = self._decode(buf)
            px = arr.astype(np.int64)
            ids.append(doc_id)
            ws.append(w)
            hs.append(h)
            chans.append(arr.shape[2])
            # exact integer moments (mean/std are derived views; integers
            # hash-match the SQL oracle bit-for-bit)
            sums.append(int(px.sum()))
            sumsqs.append(int((px * px).sum()))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
                "channels": pa.array(chans, pa.int32()),
                "pixel_sum": pa.array(sums, pa.int64()),
                "pixel_sumsq": pa.array(sumsqs, pa.int64()),
            }
        )


class ImageResize:
    """Actor-pool stage: nearest-neighbor resize of the fake payload
    (vectorized index-gather per image); real codec path stubbed."""

    def __init__(self, target: tuple[int, int] = (32, 32)):
        self.tw, self.th = target

    def __call__(self, tbl: pa.Table) -> pa.Table:
        out = []
        for buf in tbl.column("media").to_pylist():
            w, h, c, pix = _parse_header(buf)
            arr = np.frombuffer(pix, dtype=np.uint8).reshape(h, w, c)
            yi = (np.arange(self.th) * h // self.th)[:, None]
            xi = (np.arange(self.tw) * w // self.tw)[None, :]
            resized = arr[yi, xi]
            out.append(MAGIC + struct.pack("<HHB", self.tw, self.th, c) + resized.tobytes())
        n = tbl.num_rows
        return pa.table(
            {
                "doc_id": tbl.column("doc_id"),
                "media": pa.array(out, pa.large_binary()),
                "media_type": tbl.column("media_type"),
                "width": pa.array([self.tw] * n, pa.int32()),
                "height": pa.array([self.th] * n, pa.int32()),
            },
            schema=MEDIA_SCHEMA,
        )


# task-pool forms: decoder objects cached once per WORKER PROCESS. A
# fresh actor pool pays ~1 s spawn + package import per actor per
# execution — far more than the fake-codec probe costs — while tasks
# reuse the session's warm workers. The CLASSES above remain the right
# surface for stages with genuinely heavy setup (real codec contexts,
# model weights): pass them to map_batches with an explicit concurrency.
_WORKER_CACHE: dict = {}


def image_features_batch(tbl: pa.Table) -> pa.Table:
    fn = _WORKER_CACHE.get("img")
    if fn is None:
        fn = _WORKER_CACHE["img"] = ImageFeatures()
    return fn(tbl)


def frame_sample_batch(tbl: pa.Table, stride: int = 4) -> pa.Table:
    fn = _WORKER_CACHE.get(("frames", stride))
    if fn is None:
        fn = _WORKER_CACHE[("frames", stride)] = FrameSample(stride)
    return fn(tbl)


def media_features(ds: rd.Dataset, concurrency=None, batch_size: int = 64) -> rd.Dataset:
    """documents-with-media Dataset -> per-image feature rows (payload
    column dropped before any shuffle). Default: task pool with a
    per-worker cached decoder; pass ``concurrency`` to run the
    :class:`ImageFeatures` actor pool instead (heavy real-codec setup)."""
    if concurrency is not None:
        return ds.map_batches(
            ImageFeatures, batch_size=batch_size, concurrency=concurrency, batch_format="pyarrow"
        )
    return ds.map_batches(image_features_batch, batch_size=batch_size, batch_format="pyarrow")


VIDEO_MAGIC = b"VXVID"


def make_fake_video(tbl: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Deterministic fake video payload: ``VXVID + n_frames:u16 + w:u16 +
    h:u16 + frames`` (each frame w*h grayscale bytes). Same closed-form
    construction as ``make_fake_media``: ``seed = fingerprint(text)``,
    ``nf = 8 + seed % 24``, ``w = 8 + (seed // 24) % 16``,
    ``h = 8 + (seed // 384) % 16``, byte ``g`` of the frame stream =
    ``(seed + g) % 256`` — SQL-recomputable per sampled frame."""
    ids = tbl.column(id_col).to_pylist()
    seeds = _doc_seed(tbl, text_col)
    payloads, frames = [], []
    for seed in seeds.tolist():
        nf = 8 + seed % 24
        w, hh = 8 + (seed // 24) % 16, 8 + (seed // 384) % 16
        data = ((seed + np.arange(nf * w * hh, dtype=np.int64)) % 256).astype(np.uint8).tobytes()
        payloads.append(VIDEO_MAGIC + struct.pack("<HHH", nf, w, hh) + data)
        frames.append(nf)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "media": pa.array(payloads, pa.large_binary()),
            "media_type": pa.array(["video/vx-fake"] * len(ids), pa.string()),
            "n_frames": pa.array(frames, pa.int32()),
        }
    )


class FrameSample:
    """Actor-pool stage: sample every ``stride``-th frame of a video
    payload into image rows (one output row per sampled frame). Real
    decoder (ffmpeg/pyav) probed once per actor; deterministic fake
    parser otherwise. Use small batch_size — payloads are large."""

    def __init__(self, stride: int = 4):
        self.stride = stride
        # codec probe once per actor (same pattern as ImageFeatures/PIL):
        # pyav decodes real container bytes when present; VXVID payloads
        # always take the deterministic fake parser
        try:
            import av

            self._av = av
        except ImportError:  # this container: no pyav
            self._av = None

    def _frames(self, buf: bytes):
        """Yield (frame_idx, grayscale HxW uint8 array) every stride-th
        frame — fake VXVID parser or real pyav container decode."""
        if buf.startswith(VIDEO_MAGIC):
            nf, w, h = struct.unpack("<HHH", buf[5:11])
            frames = np.frombuffer(buf[11:], dtype=np.uint8).reshape(nf, h, w)
            for i in range(0, nf, self.stride):
                yield i, frames[i]
            return
        if self._av is not None:  # real codec path (mp4/mkv/webm/...)
            import io

            with self._av.open(io.BytesIO(buf)) as container:
                stream = container.streams.video[0]
                for i, frame in enumerate(container.decode(stream)):
                    if i % self.stride == 0:
                        yield i, frame.to_ndarray(format="gray")
            return
        raise NotImplementedError(
            "non-VXVID payload and no pyav in this environment: install av "
            "for the real codec path"
        )

    def __call__(self, tbl: pa.Table) -> pa.Table:
        ids, fidx, media, ws, hs = [], [], [], [], []
        for doc_id, buf in zip(tbl.column("doc_id").to_pylist(), tbl.column("media").to_pylist()):
            for i, gray in self._frames(buf):
                h, w = gray.shape
                ids.append(doc_id)
                fidx.append(i)
                # one grayscale frame as a VXIMG payload (1 channel)
                media.append(
                    MAGIC + struct.pack("<HHB", w, h, 1) + np.ascontiguousarray(gray).tobytes()
                )
                ws.append(w)
                hs.append(h)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "media": pa.array(media, pa.large_binary()),
                "media_type": pa.array(["image/vx-fake"] * len(ids), pa.string()),
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
            }
        )
