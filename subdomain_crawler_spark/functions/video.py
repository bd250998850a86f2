"""Video payload kernels — frame containers + stride sampling (numpy-only).

The driver brief names frame-sampling as a first-class multimodal op: treat
video as an opaque ``binary`` column with typed metadata and implement the
sample step as an Arrow-batched kernel over ``mapInPandas``.  Real codecs
(H.264/VP9/AV1) need external libs absent from this container and are
stubbed behind ``NotImplementedError`` exactly like the JPEG/PNG stubs in
``functions/image.py``; the container below is a real, deterministic format
so the Spark-side plumbing — binary column in, exploded per-frame rows out,
batch iterator shape — runs against genuine bytes, not mocks.

Container ``rawv``: 20-byte header (magic ``VID0``, w:uint32le, h:uint32le,
n_frames:uint32le, fps:uint32le) followed by ``n_frames`` RGB24 frames
(h·w·3 bytes each, row-major) — i.e. the video twin of the ``raw`` image
codec, so every decoded frame feeds the SAME ``average_hash`` kernel the
image pipeline uses.
"""

from __future__ import annotations

import struct

import numpy as np

_VID_MAGIC = b"VID0"
_HEADER = struct.Struct("<4sIIII")


def encode_video(frames: np.ndarray, fps: int = 25) -> bytes:
    """``frames``: (n, h, w, 3) uint8 → rawv bytes."""
    n, h, w, c = frames.shape
    assert c == 3 and frames.dtype == np.uint8
    return _HEADER.pack(_VID_MAGIC, w, h, n, fps) + frames.tobytes()


def video_meta(buf: bytes) -> tuple[int, int, int, int]:
    """(w, h, n_frames, fps) — header-only, no frame bytes touched."""
    magic, w, h, n, fps = _HEADER.unpack_from(buf, 0)
    assert magic == _VID_MAGIC, "bad rawv magic"
    return w, h, n, fps


def decode_video(buf: bytes, fmt: str = "rawv") -> np.ndarray:
    """rawv bytes → (n, h, w, 3) uint8.  Unknown codecs raise (stub)."""
    if fmt != "rawv":
        raise NotImplementedError(
            f"video codec {fmt!r} needs external decoders not present in "
            f"this container; rawv exercises the identical Spark plumbing")
    w, h, n, _ = video_meta(buf)
    return (np.frombuffer(buf, dtype=np.uint8, offset=_HEADER.size)
            .reshape(n, h, w, 3).copy())


def sample_frames(buf: bytes, stride: int, fmt: str = "rawv"):
    """Yield (frame_idx, frame) for frames 0, stride, 2·stride, … — the
    kernel only materializes SAMPLED frames (offset arithmetic into the
    buffer), never the full video: at scale the dominant cost is the bytes
    actually hashed, not the container size."""
    if fmt != "rawv":
        raise NotImplementedError(f"video codec {fmt!r} not available here")
    w, h, n, _ = video_meta(buf)
    fsz = h * w * 3
    for idx in range(0, n, stride):
        off = _HEADER.size + idx * fsz
        frame = (np.frombuffer(buf, dtype=np.uint8, count=fsz, offset=off)
                 .reshape(h, w, 3))
        yield idx, frame
