"""Streaming near-duplicate probe: a new-document stream checks itself
against a STATIC indexed corpus with stream-static MinHash band joins.

The Structured-Streaming twin of ``functions.dedup.minhash_probe_pairs``
(the daily-crawl-vs-corpus pass): the corpus band index and candidate
token table are computed ONCE per release on the static side; each
micro-batch then pays only

* map-side signature + band-row expressions over the batch;
* a stream-static INNER equi-join on the band key (supported by the
  engine without state: the static side is broadcast or re-scanned per
  batch, the stream side never buffers);
* a ``dropDuplicates`` on the (new_id, old_id) pair — the one stateful
  op, keyed on candidate pairs, so state grows with MATCHES, not the
  corpus (bound it upstream with a watermark on an event-time column
  when the stream is unbounded);
* a second stream-static join to fetch the corpus candidate's token
  array, and a map-side exact-Jaccard verify.

Identical batch semantics: run on a plain DataFrame this produces the
same pairs as ``minhash_probe_pairs`` with the same parameters (modulo
that function's candidate-sized semi-join fetch, an optimisation, not
a semantic) — which is what the st6 gate's SQL oracle replays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.dedup import hash_params, minhash_signatures
from ..functions.text import tokens


def _band_rows(
    sigs: DataFrame, out_id: str, id_col: str, k: int, bands: int
) -> DataFrame:
    """Explode mh0..mh{k-1} into (id, band, sig) rows — the shared LSH
    banding; ``minhash_probe_pairs`` builds the same rows on the batch
    path (functions/dedup.py)."""
    rows_per_band = k // bands
    cols = []
    for bidx in range(bands):
        members = [
            F.col(f"mh{i}")
            for i in range(bidx * rows_per_band, (bidx + 1) * rows_per_band)
        ]
        cols.append(
            F.struct(
                F.lit(bidx).alias("band"),
                F.concat_ws("_", *members).alias("sig"),
            )
        )
    keep = [F.col(c) for c in sigs.columns if c not in (id_col,)]
    return (
        sigs.filter(F.col("mh0").isNotNull())
        .select(
            F.col(id_col).alias(out_id),
            *keep,
            F.explode(F.array(*cols)).alias("b"),
        )
        .select(
            out_id, *[c for c in sigs.columns if c != id_col],
            F.col("b.band").alias("band"), F.col("b.sig").alias("sig"),
        )
    )


def probe_neardup_stream(
    stream: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    base_hash: str = "md5",
) -> DataFrame:
    """Per-micro-batch MinHash probe of ``stream`` against the static
    ``corpus``; emits ``(new_id, old_id, jaccard)`` for verified pairs
    >= ``threshold``. Works identically on a batch frame (the gate /
    oracle path)."""
    if k % bands:
        raise ValueError(f"k={k} not divisible by bands={bands}")
    tok_arr = F.filter(
        F.array_distinct(tokens(text_col)), lambda t: t != F.lit("")
    )

    # static index: corpus band rows + token arrays (computed once per
    # release in production; re-used across every micro-batch)
    sig_c = minhash_signatures(
        corpus.select(id_col, text_col), id_col, text_col, k, base_hash
    ).select(id_col, *[f"mh{i}" for i in range(k)])
    corpus_bands = _band_rows(sig_c, "old_id", id_col, k, bands).select(
        "old_id", "band", "sig"
    )
    corpus_toks = corpus.select(
        F.col(id_col).alias("old_id"), tok_arr.alias("__tb")
    )

    # stream side: map-side signatures; token array rides through the
    # band explode so the verify needs no second pass over the stream
    sig_s = minhash_signatures(
        stream.select(id_col, text_col), id_col, text_col, k, base_hash
    ).select(id_col, tok_arr.alias("__ta"), *[f"mh{i}" for i in range(k)])
    stream_bands = _band_rows(sig_s, "new_id", id_col, k, bands).select(
        "new_id", "__ta", "band", "sig"
    )

    cand = (
        stream_bands.join(corpus_bands, ["band", "sig"])
        .select("new_id", "old_id", "__ta")
        .dropDuplicates(["new_id", "old_id"])
    )
    inter = F.size(F.array_intersect("__ta", "__tb")).cast("double")
    union = (
        F.size("__ta") + F.size("__tb")
        - F.size(F.array_intersect("__ta", "__tb"))
    ).cast("double")
    return (
        cand.join(corpus_toks, "old_id")
        .select("new_id", "old_id", (inter / union).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
