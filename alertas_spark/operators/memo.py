"""Session-scoped memo for expensive trained artifacts.

Iteratively-trained relations (the k-means coarse quantizer's assignment table,
trained PQ codebooks) are produced by multi-round Lloyd loops whose results are
already materialized via ``localCheckpoint`` to truncate lineage.  Several
declared queries in one session need the *same* artifact (the standalone trained
query, the recall dashboard, the re-rank tier), and the driver / bench / verify
harnesses run them all back-to-back in a single session — retraining per query
repeats identical work.

This memo caches the checkpointed artifact keyed by ``(session, sf_dir, name)``
so training runs once per session per dataset.  Only relations that are ALREADY
``localCheckpoint``-ed belong here: the memo then changes no downstream plan
shape (consumers were reading a checkpoint scan either way), only how many times
the training pipeline runs.

At 100 TB the same pattern holds — a trained quantizer is a tiny shared artifact
(K × DIM doubles) produced once and broadcast to every consumer; re-deriving it
inside each query would repeat full-corpus scans.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[tuple, DataFrame] = {}


def session_artifact(spark: SparkSession, key: tuple,
                     build: Callable[[], DataFrame]) -> DataFrame:
    """Return the memoized artifact for ``key``, building (and caching) on miss.

    ``build`` must return an eagerly-materialized DataFrame (``localCheckpoint``)
    — the memo hands the same object to every consumer in the session.

    Keyed by ``applicationId`` (unique per SparkContext), not ``id(spark)``: a
    stopped context invalidates its checkpointed blocks, and a Python object id
    can be reused after GC — either would hand a dead artifact to a new session."""
    k = (spark.sparkContext.applicationId, *key)
    df = _CACHE.get(k)
    if df is None:
        df = _CACHE[k] = build()
    return df


def clear() -> None:
    """Drop all memoized artifacts (tests / plan audits that need cold builds)."""
    _CACHE.clear()


def artifact_count() -> int:
    """Number of live memoized artifacts (bench uses this to detect which
    queries build session artifacts, so warm timings can be reported separately
    from the cold headline)."""
    return len(_CACHE)
