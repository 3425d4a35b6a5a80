"""Multimodal columns: opaque ``binary`` payloads + typed metadata,
processed by actor-pool ``map_batches`` stages (build-brief requirement;
the reference is text-only — ``html: binary`` from input_hint is the
only binary column it implies).

The decode kernels themselves are STUBBED — image/audio libraries are
not in this container — behind ``decoder="fake"`` (deterministic
hash-derived pseudo-decode, fully testable) and ``decoder="real"``
(raises ``NotImplementedError`` with the intended PIL/libav call named).
Everything Ray-side is real and tested: schema, batch sizing for wide
binary rows, actor signature, zero-copy Arrow in/out, output layout.

Scale note: binary payloads dominate block size — stages here use small
``batch_size`` and the payload column is DROPPED as soon as features
are extracted (same rule as html in P1, SURVEY.md §7.3 "Wide rows").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("kind", pa.string()),          # image | audio | video
    ("mime", pa.string()),
    ("payload", pa.binary()),
    ("width", pa.int32()),          # typed metadata (nullable)
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def synth_media(n: int, *, parallelism: int = 4):
    """Deterministic synthetic media table (payload = seeded bytes)."""
    import ray.data as rd

    from sigraph_ray.sources.synth import _mix

    def gen(b) -> pa.Table:
        rows = []
        for i in map(int, b["id"]):
            kind = ("image", "audio", "video")[_mix(7, i, 1) % 3]
            size = 256 + _mix(7, i, 2) % 2048
            payload = bytes(
                (np.frombuffer(
                    np.arange(size, dtype=np.uint64).tobytes(), np.uint8)
                 + (_mix(7, i, 3) % 251)) % 256)
            rows.append({
                "media_id": f"m{i:08d}", "kind": kind,
                "mime": {"image": "image/png", "audio": "audio/wav",
                         "video": "video/mp4"}[kind],
                "payload": payload,
                "width": 64 + _mix(7, i, 4) % 512 if kind != "audio" else None,
                "height": 64 + _mix(7, i, 5) % 512 if kind != "audio" else None,
                "duration_ms": (1000 + _mix(7, i, 6) % 60000
                                if kind != "image" else None),
            })
        return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)

    return rd.range(n, override_num_blocks=parallelism).map_batches(
        gen, batch_format="numpy")


class MediaFeatureExtractor:
    """Actor-pool stage: binary payload → fixed-size feature vector +
    scalar stats; payload dropped from the output.

    ``decoder="real"`` is the stub boundary: a production build decodes
    with PIL / soundfile / PyAV here (loaded once per actor in
    __init__). ``decoder="fake"`` derives deterministic pseudo-features
    from payload bytes so the full Ray plumbing is exercised in tests.
    """

    def __init__(self, decoder: str = "fake", feat_dim: int = 16):
        if decoder not in ("fake", "real"):
            raise ValueError(decoder)
        self.decoder = decoder
        self.feat_dim = feat_dim
        if decoder == "real":
            # would be: self.pil = importlib.import_module("PIL.Image") …
            raise NotImplementedError(
                "real decoders (PIL.Image.open / soundfile.read / "
                "av.open) are not available in this environment; use "
                "decoder='fake' for the deterministic pseudo-decode")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = np.zeros((len(payloads), self.feat_dim), dtype=np.float32)
        sizes = np.zeros(len(payloads), dtype=np.int64)
        for i, p in enumerate(payloads):
            a = np.frombuffer(p, dtype=np.uint8)
            sizes[i] = len(a)
            # deterministic pseudo-features: bucketed byte histogram
            hist = np.bincount(a % self.feat_dim, minlength=self.feat_dim)
            feats[i] = hist / max(1, len(a))
        out = batch.drop_columns(["payload"])  # wide column dies here
        out = out.append_column("payload_bytes",
                                pa.array(sizes, pa.int64()))
        out = out.append_column(
            "features", pa.FixedSizeListArray.from_arrays(
                pa.array(feats.ravel(), pa.float32()), self.feat_dim))
        return out


def extract_media_features(media, *, concurrency: int = 2,
                           batch_size: int = 64, decoder: str = "fake"):
    """Media Dataset → feature Dataset. Small batch_size because
    payloads are wide; concurrency × num_cpus sized by the caller."""
    return media.map_batches(
        MediaFeatureExtractor, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency,
        fn_constructor_kwargs={"decoder": decoder})


class MediaResizer:
    """Actor-pool resize stage (images/video posters): payload in →
    resized payload out, width/height metadata rewritten. Same stub
    boundary as :class:`MediaFeatureExtractor`: ``decoder="real"``
    names the PIL resize call and raises (library absent);
    ``decoder="fake"`` produces a deterministic size-proportional byte
    subsample so tests exercise the real Ray plumbing — binary column
    REPLACED in place (not duplicated: peak block width stays one
    payload per row), metadata columns rewritten, non-image rows passed
    through untouched."""

    def __init__(self, decoder: str = "fake", target: int = 64):
        if decoder not in ("fake", "real"):
            raise ValueError(decoder)
        if decoder == "real":
            raise NotImplementedError(
                "real resize (PIL.Image.open(...).resize((t, t))) needs "
                "PIL; use decoder='fake'")
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = self.target
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        widths = batch.column("width").to_pylist()
        heights = batch.column("height").to_pylist()
        out_p, out_w, out_h = [], [], []
        for kind, p, w, h in zip(kinds, payloads, widths, heights):
            if kind != "image" or not w or not h:
                out_p.append(p); out_w.append(w); out_h.append(h)
                continue
            # fake resize: keep bytes proportional to t²/(w·h)
            a = np.frombuffer(p, dtype=np.uint8)
            keep = max(1, int(len(a) * min(1.0, (t * t) / (w * h))))
            stride = max(1, len(a) // keep)
            out_p.append(a[::stride][:keep].tobytes())
            out_w.append(min(w, t)); out_h.append(min(h, t))
        i = batch.schema.get_field_index
        out = batch.set_column(i("payload"), "payload",
                               pa.array(out_p, pa.binary()))
        out = out.set_column(i("width"), "width",
                             pa.array(out_w, pa.int32()))
        out = out.set_column(i("height"), "height",
                             pa.array(out_h, pa.int32()))
        return out


def resize_media(media, *, concurrency: int = 2, batch_size: int = 64,
                 decoder: str = "fake", target: int = 64):
    return media.map_batches(
        MediaResizer, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"decoder": decoder, "target": target})


class FrameSampler:
    """Video frame-sampling stage: one video row → ``n_frames`` frame
    rows (uniform over the duration), the 1→N expansion every video
    pipeline needs. ``decoder="real"`` names the PyAV keyframe seek and
    raises; ``decoder="fake"`` emits deterministic payload slices.
    Output schema: (media_id, frame_idx, ts_ms, frame_payload) — the
    source payload does NOT propagate (each output row carries only its
    own frame), keeping the expansion's block width bounded by
    n_frames × frame size, not n_frames × video size."""

    def __init__(self, decoder: str = "fake", n_frames: int = 4):
        if decoder not in ("fake", "real"):
            raise ValueError(decoder)
        if decoder == "real":
            raise NotImplementedError(
                "real frame sampling (av.open(...).seek + decode) needs "
                "PyAV; use decoder='fake'")
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, tss, frames = [], [], [], []
        n = self.n_frames
        for mid, kind, p, dur in zip(batch.column("media_id").to_pylist(),
                                     batch.column("kind").to_pylist(),
                                     batch.column("payload").to_pylist(),
                                     batch.column("duration_ms").to_pylist()):
            if kind != "video":
                continue
            a = np.frombuffer(p, dtype=np.uint8)
            step = max(1, len(a) // n)
            for f in range(n):
                ids.append(mid)
                idxs.append(f)
                tss.append(int((dur or 0) * f / n))
                frames.append(a[f * step:(f + 1) * step].tobytes())
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "frame_idx": pa.array(idxs, pa.int32()),
            "ts_ms": pa.array(tss, pa.int64()),
            "frame_payload": pa.array(frames, pa.binary()),
        })


def sample_frames(media, *, concurrency: int = 2, batch_size: int = 32,
                  decoder: str = "fake", n_frames: int = 4):
    return media.map_batches(
        FrameSampler, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"decoder": decoder, "n_frames": n_frames})
