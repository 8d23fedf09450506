"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed by actor-pool ``map_batches`` stages.

The decode step is STUBBED: real codec libraries (PIL / torchaudio / pyav)
are not in this container, so ``MediaDecoder`` tries to import them and falls
back to a deterministic synthetic codec (documented header + seeded PRNG
pixels). Everything around the stub — schema, batch sizing, actor signature,
zero-copy binary handling, output layout — is real and tested, which is the
part that matters for the Ray-side plumbing.

Stage pattern (the reference's stateful-stage analog, StripeWriter's
dictionary state held per actor): the codec/"model" is constructed once per
actor in ``__init__`` and reused across batches; payloads are large, so
``batch_size`` stays small and blocks stream with backpressure.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

MAGIC_IMG = b"FIMG"
MAGIC_VID = b"FVID"
_HDR = np.dtype([("w", "<u2"), ("h", "<u2"), ("frames", "<u2")])


# ---------------------------------------------------------------------------
# deterministic synthetic media (the test/bench stand-in for real payloads)


def _payload(media_id: int, w: int, h: int, frames: int) -> bytes:
    rng = np.random.default_rng(media_id)
    pixels = rng.integers(0, 256, size=frames * w * h, dtype=np.uint8)
    hdr = np.array([(w, h, frames)], dtype=_HDR).tobytes()
    return (MAGIC_VID if frames > 1 else MAGIC_IMG) + hdr + pixels.tobytes()


def synthesize_media(
    ds: rd.Dataset, id_col: str = "doc_id", seed: int = 1234,
) -> rd.Dataset:
    """Derive a deterministic media table (media_id, media_type, width,
    height, n_frames, payload:binary) from any table with an integer id."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        rng = np.random.default_rng(seed)
        # per-id deterministic dims (independent of batch boundaries)
        w = 16 + (ids % 3) * 8
        h = 16 + (ids % 5) * 4
        frames = np.where(ids % 4 == 0, 6, 1)
        payloads = [
            _payload(int(i), int(wi), int(hi), int(fi))
            for i, wi, hi, fi in zip(ids, w, h, frames)
        ]
        return pa.table({
            "media_id": pa.array(ids),
            "media_type": pa.array(np.where(frames > 1, "video", "image")),
            "width": pa.array(w.astype(np.int32)),
            "height": pa.array(h.astype(np.int32)),
            "n_frames": pa.array(frames.astype(np.int32)),
            "payload": pa.array(payloads, type=pa.binary()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# decode (actor-pool stage, stubbed codec)


class MediaDecoder:
    """Actor-pool callable: decodes binary payloads to per-frame pixel
    arrays. Real codec import is attempted once per ACTOR (not per batch);
    the deterministic fallback parses the synthetic header format."""

    def __init__(self):
        try:  # pragma: no cover - not present in this container
            import PIL.Image  # noqa: F401

            self.backend = "pil"
        except ImportError:
            self.backend = "synthetic"

    def decode_one(self, buf: bytes) -> tuple[np.ndarray, int, int, int]:
        """(flat pixels uint8, w, h, frames)."""
        if self.backend == "pil":  # pragma: no cover
            raise NotImplementedError(
                "real image decode requires PIL; container ships without it")
        magic, rest = buf[:4], buf[4:]
        if magic not in (MAGIC_IMG, MAGIC_VID):
            raise ValueError("unknown media payload")
        hdr = np.frombuffer(rest[: _HDR.itemsize], dtype=_HDR)[0]
        w, h, frames = int(hdr["w"]), int(hdr["h"]), int(hdr["frames"])
        pixels = np.frombuffer(rest[_HDR.itemsize :], dtype=np.uint8)
        return pixels, w, h, frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        pixel_lists, ws, hs, fs = [], [], [], []
        for buf in batch.column("payload"):
            px, w, h, fr = self.decode_one(buf.as_py())
            pixel_lists.append(px)
            ws.append(w)
            hs.append(h)
            fs.append(fr)
        # int32 offsets bound one decoded block to <2 GiB of pixels — hold by
        # keeping batch_size small for large payloads
        offsets = np.concatenate([[0], np.cumsum([len(p) for p in pixel_lists])]).astype(np.int32)
        flat = np.concatenate(pixel_lists) if pixel_lists else np.empty(0, np.uint8)
        pixels = pa.ListArray.from_arrays(
            pa.array(offsets), pa.array(flat, type=pa.uint8())
        )
        return pa.table({
            "media_id": batch.column("media_id"),
            "width": pa.array(np.asarray(ws, dtype=np.int32)),
            "height": pa.array(np.asarray(hs, dtype=np.int32)),
            "n_frames": pa.array(np.asarray(fs, dtype=np.int32)),
            "pixels": pixels,
        })


def decode_media(ds: rd.Dataset, concurrency=(1, 8), batch_size: int = 64) -> rd.Dataset:
    """Large binary payloads → small batches + actor pool (codec state is
    per-actor; object store spills rather than worker heaps filling)."""
    return ds.map_batches(
        MediaDecoder, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# feature extraction / resize / frame sampling (vectorized over decoded pixels)


class FeatureExtractor:
    """Actor-pool callable: 16-bin byte histogram + mean/std per item — the
    deterministic stand-in for batched model inference (the 'model' here is
    the bin-edge table, built once per actor)."""

    def __init__(self, bins: int = 16):
        self.bins = bins
        self.edges = np.linspace(0, 256, bins + 1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, means, stds = [], [], []
        col = batch.column("pixels")
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        for i in range(len(arr)):
            px = flat[offs[i] : offs[i + 1]]
            hist = np.histogram(px, bins=self.edges)[0] / max(len(px), 1)
            feats.append(hist.astype(np.float32))
            means.append(float(px.mean()) if len(px) else 0.0)
            stds.append(float(px.std()) if len(px) else 0.0)
        emb = pa.ListArray.from_arrays(
            pa.array(np.arange(len(feats) + 1, dtype=np.int32) * self.bins),
            pa.array(np.concatenate(feats) if feats else np.empty(0, np.float32),
                     type=pa.float32()),
        )
        return pa.table({
            "media_id": batch.column("media_id"),
            "feature": emb,
            "mean_pixel": pa.array(means, type=pa.float64()),
            "std_pixel": pa.array(stds, type=pa.float64()),
        })


def extract_features(ds: rd.Dataset, concurrency=(1, 8), batch_size: int = 64) -> rd.Dataset:
    return ds.map_batches(
        FeatureExtractor, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency,
    )


def resize_images(ds: rd.Dataset, out_w: int = 8, out_h: int = 8) -> rd.Dataset:
    """Nearest-neighbor resize of decoded frames (vectorized index gather per
    item). A real pipeline would swap the kernel for PIL/cv2 inside the same
    stage shape."""

    def fn(batch: pa.Table) -> pa.Table:
        col = batch.column("pixels")
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        ws = batch.column("width").to_numpy()
        hs = batch.column("height").to_numpy()
        fs = batch.column("n_frames").to_numpy()
        out = []
        for i in range(len(arr)):
            w, h, fr = int(ws[i]), int(hs[i]), int(fs[i])
            frames = flat[offs[i] : offs[i + 1]].reshape(fr, h, w)
            yi = (np.arange(out_h) * h) // out_h
            xi = (np.arange(out_w) * w) // out_w
            out.append(frames[:, yi][:, :, xi].ravel())
        offsets = np.concatenate([[0], np.cumsum([len(o) for o in out])]).astype(np.int32)
        resized = pa.ListArray.from_arrays(
            pa.array(offsets),
            pa.array(np.concatenate(out) if out else np.empty(0, np.uint8),
                     type=pa.uint8()),
        )
        return pa.table({
            "media_id": batch.column("media_id"),
            "n_frames": batch.column("n_frames"),
            "width": pa.array(np.full(len(arr), out_w, dtype=np.int32)),
            "height": pa.array(np.full(len(arr), out_h, dtype=np.int32)),
            "pixels": resized,
        })

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=64)


def sample_frames(ds: rd.Dataset, every_n: int = 2) -> rd.Dataset:
    """Keep every n-th frame of video items (images pass through)."""

    def fn(batch: pa.Table) -> pa.Table:
        col = batch.column("pixels")
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        ws = batch.column("width").to_numpy()
        hs = batch.column("height").to_numpy()
        fs = batch.column("n_frames").to_numpy()
        out, kept = [], []
        for i in range(len(arr)):
            w, h, fr = int(ws[i]), int(hs[i]), int(fs[i])
            frames = flat[offs[i] : offs[i + 1]].reshape(fr, h * w)
            sel = frames[::every_n] if fr > 1 else frames
            out.append(sel.ravel())
            kept.append(len(sel))
        offsets = np.concatenate([[0], np.cumsum([len(o) for o in out])]).astype(np.int32)
        pixels = pa.ListArray.from_arrays(
            pa.array(offsets),
            pa.array(np.concatenate(out) if out else np.empty(0, np.uint8),
                     type=pa.uint8()),
        )
        return pa.table({
            "media_id": batch.column("media_id"),
            "n_frames": pa.array(np.asarray(kept, dtype=np.int32)),
            "width": batch.column("width"),
            "height": batch.column("height"),
            "pixels": pixels,
        })

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=64)
