"""Multimodal columns — image/audio/video as opaque binary + typed
metadata, with decode/feature-extract as Arrow-batched Pandas transforms.

Design (BASELINE.json north star): media rides as a ``binary`` column
next to a metadata struct; all Spark-side plumbing (schema, partitioning,
mapInPandas batch shape) is real and tested. The codec step itself is
STUBBED — this container has no image/audio libraries — behind
``_decode_image_bytes``: a deterministic fake "decoder" that parses our
synthetic header format. A real deployment swaps in PIL/ffmpeg inside
the same batch function; nothing else changes.

Why mapInPandas: codecs are Python-only, so the exchange must cross into
Python — Arrow batches amortise that to one transfer per ~10k rows, and
per-batch numpy work keeps the Python side vectorised. The decode stage
is embarrassingly parallel: no shuffle, scales with input splits.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, content binary, "
    "meta struct<mime:string, n_bytes:long>"
)

DECODED_SCHEMA = (
    "media_id long, kind string, width int, height int, n_pixels long, "
    "mean_luma double"
)


def attach_media_meta(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Typed metadata struct for an opaque binary column."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(F.col(content_col)).cast("long").alias("n_bytes"),
        ),
    )


def _decode_image_bytes(buf: bytes) -> tuple[int, int, float]:
    """STUB decoder (deterministic fake).

    Real deployments replace this with e.g. PIL.Image.open(BytesIO(buf)).
    The fake format is ``b"IMG:<width>x<height>:"`` followed by payload
    bytes; "luma" is the mean payload byte value. Unknown formats raise,
    like a real codec would.
    """
    if not buf.startswith(b"IMG:"):
        raise NotImplementedError(
            "real image decoding requires an image library (PIL); "
            "this container ships the plumbing with a stub codec"
        )
    header, _, payload = buf[4:].partition(b":")
    w, h = (int(x) for x in header.split(b"x"))
    luma = (sum(payload) / len(payload)) if payload else 0.0
    return w, h, luma


def decode_images(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Binary image column -> per-image features via Arrow-batched
    mapInPandas (the decode stage of a multimodal training pipeline)."""
    import pandas as pd

    cols = df.select("media_id", "kind", content_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [], "kind": [], "width": [], "height": [],
                "n_pixels": [], "mean_luma": [],
            }
            for mid, kind, buf in zip(
                pdf["media_id"], pdf["kind"], pdf[content_col]
            ):
                w, h, luma = _decode_image_bytes(bytes(buf))
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["width"].append(w)
                out["height"].append(h)
                out["n_pixels"].append(w * h)
                out["mean_luma"].append(luma)
            yield pd.DataFrame(out)

    return cols.mapInPandas(run, DECODED_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    frame_col: str = "frame_index",
) -> DataFrame:
    """Frame-sampling for video tables: keep every n-th frame per media.
    Pure filter — no data movement, fully pushed down."""
    return df.filter(F.col(frame_col) % every_n == 0)


RESIZED_SCHEMA = (
    "media_id long, kind string, content binary, "
    "meta struct<mime:string, n_bytes:long>, width int, height int"
)


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    content_col: str = "content",
) -> DataFrame:
    """Binary-in / binary-out resize stage via Arrow-batched mapInPandas
    — the shape every media transform takes (decode -> transform ->
    re-encode inside one Python batch, binary columns crossing Arrow in
    both directions, metadata recomputed from the new bytes).

    The codec is the same documented stub as ``decode_images`` (no image
    libs in this container): payload bytes are truncated/repeated to the
    target pixel count and the fake header rewritten. A real deployment
    swaps PIL's ``resize`` into the same batch function; schema,
    batching, and downstream metadata stay identical.
    """
    if target_w < 1 or target_h < 1:
        raise ValueError(f"target dims must be >= 1, got {target_w}x{target_h}")
    import pandas as pd

    cols = df.select("media_id", "kind", content_col)
    n_target = target_w * target_h

    def run(batches):
        for pdf in batches:
            out = {
                "media_id": [], "kind": [], "content": [],
                "meta": [], "width": [], "height": [],
            }
            for mid, kind, buf in zip(
                pdf["media_id"], pdf["kind"], pdf[content_col]
            ):
                _w, _h, _ = _decode_image_bytes(bytes(buf))
                payload = bytes(buf).partition(b":")[2].partition(b":")[2]
                reps = -(-n_target // max(len(payload), 1))
                resized = (payload * reps)[:n_target] if payload else b"\x00" * n_target
                content = b"IMG:%dx%d:" % (target_w, target_h) + resized
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["content"].append(content)
                out["meta"].append(
                    {"mime": "application/octet-stream", "n_bytes": len(content)}
                )
                out["width"].append(target_w)
                out["height"].append(target_h)
            yield pd.DataFrame(out)

    return cols.mapInPandas(run, RESIZED_SCHEMA)


FEATURES_SCHEMA = "media_id long, kind string, embedding array<double>"


def extract_features(
    df: DataFrame,
    content_col: str = "content",
    dim: int = 16,
) -> DataFrame:
    """The FEATURE-EXTRACT stage of the multimodal pipeline: binary
    image -> fixed-width feature vector via Arrow-batched mapInPandas,
    vectorised per batch with numpy (``frombuffer`` + ``bincount`` —
    no per-byte Python loop).

    The stub feature is a ``dim``-bin normalised byte histogram of the
    payload (deterministic, library-free); a real deployment swaps a
    vision encoder into the same batch function and nothing else
    changes. The output ``embedding`` column feeds directly into
    ``similarity.cosine_topk`` / ``cosine_topk_ivf`` — multimodal
    decode -> embed -> ANN as one lazy plan, no shuffle until the ANN
    stage's tiny top-k exchange.
    """
    if dim < 1 or dim > 256:
        raise ValueError(f"dim must be in [1, 256], got {dim}")
    import numpy as np
    import pandas as pd

    cols = df.select("media_id", "kind", content_col)

    def run(batches):
        for pdf in batches:
            ids, kinds, vecs = [], [], []
            for mid, kind, buf in zip(
                pdf["media_id"], pdf["kind"], pdf[content_col]
            ):
                _w, _h, _ = _decode_image_bytes(bytes(buf))
                payload = bytes(buf).partition(b":")[2].partition(b":")[2]
                if payload:
                    b = np.frombuffer(payload, dtype=np.uint8)
                    hist = np.bincount(b % dim, minlength=dim).astype(
                        np.float64
                    ) / len(b)
                else:
                    hist = np.zeros(dim, dtype=np.float64)
                ids.append(mid)
                kinds.append(kind)
                vecs.append(hist.tolist())
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "embedding": vecs}
            )

    return cols.mapInPandas(run, FEATURES_SCHEMA)
