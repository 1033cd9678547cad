"""Partition-parallel REST ingestion (S1/S2/S3, SET2).

Reference: taar_etl/taar_amodump.py drives a 100-thread requests pool with a
retry pass over the exception pool (:102-124,117-123) and chunk-of-500
version fetches (:126-190). Spark-first: the URL list is a DataFrame,
repartitioned to the desired fetch concurrency; `mapInPandas` executes the
HTTP GETs partition-parallel on executors (partition ≙ worker thread,
`repartition(n)` ≙ `--workers n`); per-row status/error columns make the
retry pass a simple filtered union (SET2), and task retry
(`spark.task.maxFailures`) supersedes the pool-of-exceptions pattern.

The fetcher is injectable so tests run fully offline (recorded fixtures);
the default uses urllib from the executor (no extra deps).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FETCH_RESULT_SCHEMA = "url string, status int, body string, error string"


def default_fetcher(url: str, timeout: float = 2.0) -> tuple[int, str]:
    """GET one URL (2.0 s timeout parity, taar_etl/taar_amodump.py:152)."""
    import urllib.request

    with urllib.request.urlopen(url, timeout=timeout) as resp:  # noqa: S310
        return resp.status, resp.read().decode("utf-8")


def fetch_urls(
    urls: DataFrame,
    workers: int = 100,
    fetcher: Callable[[str], tuple[int, str]] | None = None,
    url_col: str = "url",
) -> DataFrame:
    """S1 — fan the URL set out over `workers` partitions and GET each one.

    Output columns: url, status, body, error. Failures become rows
    (status NULL, error set) rather than task failures, so one bad URL
    doesn't fail a partition of good ones — the reference's skip-and-log
    tolerance (taar_etl/taar_amodump.py:206-208,224-226)."""
    fetch = fetcher or default_fetcher

    def run_partition(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for url in pdf[url_col]:
                try:
                    status, body = fetch(url)
                    out.append((url, status, body, None))
                except Exception as exc:  # noqa: BLE001
                    out.append((url, None, None, str(exc)))
            yield pd.DataFrame(
                out, columns=["url", "status", "body", "error"]
            )

    return (
        urls.repartition(workers)
        .mapInPandas(run_partition, schema=FETCH_RESULT_SCHEMA)
    )


def fetch_with_retry(
    urls: DataFrame,
    workers: int = 100,
    fetcher: Callable[[str], tuple[int, str]] | None = None,
) -> DataFrame:
    """SET2 — one retry pass over the failure pool, then union with the
    successes, newest-wins dedup by url (taar_etl/taar_amodump.py:117-123:
    `pool.exceptions()` re-fetch merged into responses)."""
    first = fetch_urls(urls, workers, fetcher).cache()
    ok = first.filter(F.col("status") == 200)
    failed = first.filter(
        F.col("status").isNull() | (F.col("status") != 200)
    ).select("url")
    retried = fetch_urls(failed, workers, fetcher).filter(
        F.col("status") == 200
    )
    return ok.unionByName(retried).dropDuplicates(["url"])
