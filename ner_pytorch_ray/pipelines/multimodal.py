"""Multimodal columns: opaque binary payloads + typed metadata, processed by
actor-pool stages.

Images/audio/video are ``binary`` columns with metadata columns alongside
(the pages table's ``html: binary`` follows the same convention). The decode
kernels are STUBBED (no image/audio libs in this container — clearly marked
below); everything Ray-side is real and tested: schema handling, small
``batch_size`` for large payloads, actor ``__init__`` state, zero-copy
binary access, and the output layout.

A deterministic fake decoder (``fake_decode=True``) lets tests exercise the
full path end-to-end with reproducible 'features'.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_bytes", pa.int64()),
    ]
)


def synthesize_media_from_documents(
    sf_dir: str, kind: str = "image", dup_mod: int | None = None
) -> ray.data.Dataset:
    """Deterministic fake media table derived from documents (payload =
    repeatable pseudo-random bytes keyed by doc_id) — test/bench input.

    ``dup_mod``: key payload AND dims by ``doc_id % dup_mod`` instead of
    doc_id — plants exact duplicate media across docs (the input for the
    perceptual-hash dedup path)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )

    def _u64(s: str) -> int:
        # == dedup._stable_u64: md5-based, SQL-expressible for the oracle
        # gate (md5_number_upper(s) & (2^63-1)); inlined so the pickled UDF
        # has no deferred package import on the worker
        v = int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")
        return v & 0x7FFFFFFFFFFFFFFF

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        payloads, widths, heights = [], [], []
        for d in ids:
            key = int(d) % dup_mod if dup_mod else int(d)
            # md5-derived dims; payload bytes stay numpy-rng (only the
            # dropped 'feature' column depends on them)
            w = 8 + _u64(f"{key}:w") % 56
            h = 8 + _u64(f"{key}:h") % 56
            rng = np.random.RandomState(key % (2**31))
            payloads.append(rng.bytes(w * h))
            widths.append(w)
            heights.append(h)
        return pa.Table.from_arrays(
            [
                pa.array(ids, type=pa.int64()),
                pa.array([kind] * len(ids), type=pa.string()),
                pa.array(payloads, type=pa.binary()),
                pa.array(widths, type=pa.int32()),
                pa.array(heights, type=pa.int32()),
                pa.array([len(p) for p in payloads], type=pa.int64()),
            ],
            schema=MEDIA_SCHEMA,
        )

    return ds.map_batches(to_media, batch_format="pyarrow")


class MediaFeatureActor:
    """Actor-pool stage: decode + feature-extract media payloads.

    Real decode requires PIL/cv2/ffmpeg — ABSENT in this container, so the
    real path raises ``NotImplementedError`` (clearly-marked stub). The
    deterministic fake path hashes payload bytes into a feature vector so
    the Ray plumbing (actor init, batch sizing, output schema) is fully
    exercised and reproducible.
    """

    def __init__(self, feature_dim: int = 16, fake_decode: bool = True):
        self.feature_dim = feature_dim
        self.fake_decode = fake_decode
        # real models/codecs would load HERE, once per actor

    def _decode_real(self, payload: bytes, kind: str):
        raise NotImplementedError(
            "media decode requires PIL/cv2/ffmpeg — not available in this "
            "container; run with fake_decode=True for the plumbing path"
        )

    def _decode_fake(self, payload: bytes) -> np.ndarray:
        need = self.feature_dim * 4
        if need <= 64:  # blake2b's max digest — the original single-block path
            h = hashlib.blake2b(payload, digest_size=need).digest()
        else:
            # wider features: concatenate salted 64-byte blocks
            # (dims <= 16 keep the original byte-identical formula)
            blocks = []
            for i in range((need + 63) // 64):
                blocks.append(
                    hashlib.blake2b(
                        payload, digest_size=64, salt=i.to_bytes(8, "little")
                    ).digest()
                )
            h = b"".join(blocks)[:need]
        return (
            np.frombuffer(h, dtype=np.uint32).astype(np.float32)
            / np.float32(2**32)
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload")
        kinds = batch.column("kind").to_pylist()
        feats = []
        for i in range(len(batch)):
            p = payloads[i].as_py()
            if self.fake_decode:
                feats.append(self._decode_fake(p))
            else:
                feats.append(self._decode_real(p, kinds[i]))
        return pa.Table.from_pydict(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "feature": pa.array(
                    [f.tolist() for f in feats], type=pa.list_(pa.float32())
                ),
                "n_bytes": batch.column("n_bytes"),
            }
        )


def media_features(
    media: ray.data.Dataset,
    feature_dim: int = 16,
    fake_decode: bool = True,
    concurrency: int | tuple[int, int] = (1, 4),
    batch_size: int = 64,  # small: payloads are wide rows
) -> ray.data.Dataset:
    return media.map_batches(
        MediaFeatureActor,
        fn_constructor_args=(feature_dim, fake_decode),
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )


def synthesize_video_from_documents(
    sf_dir: str, bytes_per_frame: int = 256
) -> ray.data.Dataset:
    """Deterministic fake video table: payload length implies a frame count
    (n_frames = n_bytes // bytes_per_frame) — metadata-real, content-fake."""
    media = synthesize_media_from_documents(sf_dir, kind="video")

    def add_frames(batch: pa.Table) -> pa.Table:
        nb = batch.column("n_bytes").to_numpy()
        return batch.append_column(
            "n_frames",
            pa.array((nb // bytes_per_frame).astype(np.int64), type=pa.int64()),
        )

    return media.map_batches(add_frames, batch_format="pyarrow")


class FrameSampleActor:
    """Video frame sampling: emit up to ``max_frames`` evenly-spaced frames
    per clip as rows (media_id, frame_idx, byte_offset, frame_payload).

    Real decode (ffmpeg) is ABSENT in this container — the real path raises
    ``NotImplementedError`` (clearly-marked stub). The fake path slices the
    payload at the computed offsets, so offsets/row-explosion/batch sizing —
    the Ray-side plumbing — are real and SQL-verifiable (offsets are pure
    integer arithmetic on n_bytes).
    """

    def __init__(
        self,
        max_frames: int = 4,
        bytes_per_frame: int = 256,
        fake_decode: bool = True,
    ):
        self.max_frames = max_frames
        self.bpf = bytes_per_frame
        self.fake_decode = fake_decode
        # a real ffmpeg/codec context would initialize HERE, once per actor

    def _frame_offsets(self, n_frames: int) -> list[int]:
        k = min(self.max_frames, n_frames)
        if k <= 0:
            return []
        # evenly spaced: frame i of k samples frame floor(i * n_frames / k)
        return [(i * n_frames) // k for i in range(k)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake_decode:
            raise NotImplementedError(
                "video decode requires ffmpeg — unavailable in this container"
            )
        payloads = batch.column("payload")
        ids = batch.column("media_id").to_pylist()
        n_frames = batch.column("n_frames").to_pylist()
        o_id, o_idx, o_off, o_payload = [], [], [], []
        for i, (mid, nf) in enumerate(zip(ids, n_frames)):
            p = payloads[i].as_py()
            for fi in self._frame_offsets(int(nf)):
                off = fi * self.bpf
                o_id.append(mid)
                o_idx.append(fi)
                o_off.append(off)
                o_payload.append(p[off : off + self.bpf])
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(o_id, type=pa.int64()),
                "frame_idx": pa.array(o_idx, type=pa.int64()),
                "byte_offset": pa.array(o_off, type=pa.int64()),
                "frame_payload": pa.array(o_payload, type=pa.binary()),
            }
        )


def frame_sample(
    video: ray.data.Dataset,
    max_frames: int = 4,
    bytes_per_frame: int = 256,
    fake_decode: bool = True,
    concurrency: int | tuple[int, int] = (1, 4),
    batch_size: int = 32,  # frames explode rows: keep input batches small
) -> ray.data.Dataset:
    return video.map_batches(
        FrameSampleActor,
        fn_constructor_args=(max_frames, bytes_per_frame, fake_decode),
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )


def audio_window_features(
    media: ray.data.Dataset,
    window_bytes: int = 512,
    feature_dim: int = 8,
    concurrency: int | tuple[int, int] = (1, 4),
    batch_size: int = 64,
) -> ray.data.Dataset:
    """Windowed 'spectral' features over an audio payload: one row per
    fixed-size byte window (media_id, window_id, feature). The transform is
    a deterministic hash of the window bytes (real DSP libs are absent);
    the windowing/row-explosion/actor plumbing is the real part."""

    class AudioWindowActor:
        def __init__(self):
            self.dim = feature_dim

        def _feat(self, window: bytes) -> list[float]:
            h = hashlib.blake2b(window, digest_size=self.dim * 4).digest()
            return (
                np.frombuffer(h, dtype=np.uint32).astype(np.float32)
                / np.float32(2**32)
            ).tolist()

        def __call__(self, batch: pa.Table) -> pa.Table:
            payloads = batch.column("payload")
            ids = batch.column("media_id").to_pylist()
            o_id, o_w, o_f = [], [], []
            for i, mid in enumerate(ids):
                p = payloads[i].as_py()
                for w in range(len(p) // window_bytes):
                    o_id.append(mid)
                    o_w.append(w)
                    o_f.append(self._feat(p[w * window_bytes : (w + 1) * window_bytes]))
            return pa.Table.from_pydict(
                {
                    "media_id": pa.array(o_id, type=pa.int64()),
                    "window_id": pa.array(o_w, type=pa.int64()),
                    "feature": pa.array(o_f, type=pa.list_(pa.float32())),
                }
            )

    return media.map_batches(
        AudioWindowActor,
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )


# --------------------------------------------------------- perceptual dedup
def media_phash_pairs(
    sf_dir: str,
    dup_mod: int = 400,
    max_hamming: int = 3,
    n_bands: int = 4,
    feature_dim: int = 64,
) -> ray.data.Dataset:
    """Perceptual-hash near-dup pairs over DECODED media features — the
    multimodal x dedup combination (find re-uploaded/duplicate images in a
    crawl): payloads stream through the feature actor pool, each feature
    vector collapses to a 64-bit sign-bit phash, and pairs come from the
    same 4-band pigeonhole + LUT-popcount verify the simhash path uses
    (perfect recall for hamming < n_bands).

    With the deterministic fake decoder, identical payloads give identical
    features (hamming 0) and distinct payloads differ in ~32 bits, so the
    pairs are exactly the planted duplicates (``dup_mod``) — ANSI-SQL
    oracle-able without replicating the hash. A real decoder slots in via
    ``MediaFeatureActor`` and the phash becomes a genuine perceptual
    signature over decoded pixels.
    """
    assert max_hamming < n_bands and feature_dim == 64
    from ner_pytorch_ray.pipelines.similarity import (
        _popcount,
        _popcount16_lut,
        list_col_f64,
    )
    from ner_pytorch_ray.stages.groupby_utils import (
        collect_tuples,
        flat_map_groups,
    )
    from ray.data.aggregate import Min

    width = 64 // n_bands
    mask = np.uint64((1 << width) - 1)
    lut = _popcount16_lut()

    media = synthesize_media_from_documents(sf_dir, dup_mod=dup_mod)
    feats = media_features(media, feature_dim=feature_dim, concurrency=(1, 8))

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("media_id").to_numpy())
        M = list_col_f64(batch.column("feature"))
        if not len(M):
            return pa.Table.from_pydict(
                {
                    "band": pa.array([], type=pa.int32()),
                    "key": pa.array([], type=pa.int64()),
                    "media_id": pa.array([], type=pa.int64()),
                    "phash": pa.array([], type=pa.int64()),
                }
            )
        bits = (M > 0.5).astype(np.uint64)
        ph = np.zeros(len(ids), dtype=np.uint64)
        for b in range(64):
            ph |= bits[:, b] << np.uint64(b)
        n = len(ids)
        band = np.repeat(np.arange(n_bands, dtype=np.int32), n)
        keys = np.concatenate(
            [(ph >> np.uint64(b * width)) & mask for b in range(n_bands)]
        ).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "band": pa.array(band),
                "key": pa.array(keys, type=pa.int64()),
                "media_id": pa.array(np.tile(ids, n_bands), type=pa.int64()),
                "phash": pa.array(np.tile(ph, n_bands).view(np.int64), type=pa.int64()),
            }
        )

    bands = feats.map_batches(band_rows, batch_format="pyarrow")
    collected = collect_tuples(
        bands, ["band", "key"], ["media_id", "phash"], shuffle_blocks="auto"
    )
    empty = pa.schema(
        [("media_a", pa.int64()), ("media_b", pa.int64()), ("hamming", pa.int64())]
    )

    def bucket_pairs(key, items) -> pa.Table:
        if items is None or len(items) < 2:
            return empty.empty_table()
        items = sorted({tuple(x) for x in items})
        ids = np.array([d for d, _ in items], dtype=np.int64)
        phs = np.array([p for _, p in items], dtype=np.int64)
        ai, bi = np.triu_indices(len(ids), k=1)
        ham = _popcount((phs[ai] ^ phs[bi]).view(np.uint64), lut)
        keep = ham <= max_hamming
        return pa.Table.from_pydict(
            {
                "media_a": pa.array(ids[ai[keep]], type=pa.int64()),
                "media_b": pa.array(ids[bi[keep]], type=pa.int64()),
                "hamming": pa.array(ham[keep], type=pa.int64()),
            }
        )

    pairs = flat_map_groups(collected, bucket_pairs, ["band", "key"])
    distinct = (
        pairs.repartition(8)
        .groupby(["media_a", "media_b"])
        .aggregate(Min("hamming"))
    )
    return distinct.map_batches(
        lambda t: t.rename_columns(["media_a", "media_b", "hamming"]),
        batch_format="pyarrow",
    )
