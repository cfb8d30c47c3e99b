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

import threading
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[tuple, DataFrame] = {}

#: per-key build locks so concurrent consumers of the SAME artifact build it
#: once (the second thread blocks, then reads the memo) while DIFFERENT
#: artifacts build concurrently (:func:`overlap`).  ``_LOCKS_GUARD`` protects
#: the lock dict itself; individual dict get/set on ``_CACHE`` are GIL-atomic.
_LOCKS_GUARD = threading.Lock()
_LOCKS: dict[tuple, threading.Lock] = {}


def _key_lock(k: tuple) -> threading.Lock:
    with _LOCKS_GUARD:
        lock = _LOCKS.get(k)
        if lock is None:
            lock = _LOCKS[k] = threading.Lock()
        return lock


def session_artifact(spark: SparkSession, key: tuple,
                     build: Callable[[], DataFrame]) -> DataFrame:
    """Return the memoized artifact for ``key``, building (and caching) on miss.

    ``build`` must return an eagerly-materialized DataFrame (``localCheckpoint``)
    — the memo hands the same object to every consumer in the session.

    Keyed by ``applicationId`` (unique per SparkContext), not ``id(spark)``: a
    stopped context invalidates its checkpointed blocks, and a Python object id
    can be reused after GC — either would hand a dead artifact to a new session.

    Thread-safe under :func:`overlap`: a per-key lock serializes same-key
    builds (two concurrent ANN tiers sharing one trained codebook train it
    once), while distinct keys build concurrently."""
    k = (spark.sparkContext.applicationId, *key)
    df = _CACHE.get(k)
    if df is None:
        with _key_lock(k):
            df = _CACHE.get(k)
            if df is None:
                df = _CACHE[k] = build()
    return df


_VALUES: dict[tuple, object] = {}


def session_value(spark: SparkSession, key: tuple, build: Callable[[], object]):
    """:func:`session_artifact` for non-DataFrame artifacts — e.g. the ONE
    ``sc.broadcast`` of a trained merge list that several UDF constructors
    share (building per constructor would ship one copy per consumer).  Same
    ``applicationId`` keying and per-key locking, cleared by :func:`clear`."""
    k = (spark.sparkContext.applicationId, *key)
    if k not in _VALUES:
        with _key_lock(k):
            if k not in _VALUES:
                _VALUES[k] = build()
    return _VALUES[k]


def overlap(thunks: Sequence[Callable[[], DataFrame]],
            max_workers: int = 3) -> list[DataFrame]:
    """Materialize independent artifact relations CONCURRENTLY (optimization
    guide §2.6 "overlap independent jobs"): each ``localCheckpoint`` is its own
    Spark action, and running them back-to-back from the driver leaves the
    cluster idle through every job's straggler tail.  Spark's scheduler runs
    concurrent jobs FIFO — the next job's tasks back-fill executors freed by
    the current job's tail — so a small pool cuts the wall-clock of an
    N-artifact build toward the longest single artifact without changing any
    result (every build is deterministic and lands in the same memo slot it
    would sequentially; same-key races are serialized by the per-key lock in
    :func:`session_artifact`).

    Pool size 3 by default per the guide: enough in flight to fill stage
    tails, not so many that jobs fight for task slots (or, locally, that
    concurrent aggregation buffers stack up in one heap).  Thunk exceptions
    propagate — results come back in input order, all-or-nothing."""
    if len(thunks) <= 1:
        return [t() for t in thunks]
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.util import inheritable_thread_target

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        futures = [pool.submit(inheritable_thread_target(t)) for t in thunks]
        return [f.result() for f in futures]


_PERSISTED: list[DataFrame] = []


def cached(df: DataFrame) -> DataFrame:
    """``df.cache()`` with cold-protocol registration.

    Operator-internal caches (a signature table read three times inside one
    query) are legitimate plan structure, but Spark's CacheManager substitutes
    a cached plan into ANY later query by canonicalized-subplan match — so an
    untracked ``.cache()`` silently warms the next cold-timed run of the same
    query AND of different queries sharing the subplan (measured: the prefix-
    filter join timed 3.3s in the full-corpus bench but 18.6s standalone,
    because the ngram verifier's cached shingle table fed its scan).  Routing
    through here lets ``clear()`` unpersist everything an operator pinned, so
    bench/probe cold timings stay cold."""
    _PERSISTED.append(df.cache())
    return df


def clear() -> None:
    """Drop all memoized artifacts AND unpersist tracked operator caches
    (tests / bench / plan audits that need cold builds)."""
    _CACHE.clear()
    _VALUES.clear()
    with _LOCKS_GUARD:
        _LOCKS.clear()
    for df in _PERSISTED:
        try:
            df.unpersist()
        except Exception:  # session already stopped — nothing to release
            pass
    _PERSISTED.clear()


def artifact_count() -> int:
    """Number of live memoized artifacts (bench uses this to detect which
    queries build session artifacts, so warm timings can be reported separately
    from the cold headline)."""
    return len(_CACHE)
