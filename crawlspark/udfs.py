"""Arrow-vectorized pandas UDFs wrapping the pure cores (SURVEY.md §3.10).

All Python execution crosses the JVM↔Python boundary as Arrow record
batches (BASELINE.json:15 mandates vectorized pandas/Arrow UDFs, no
per-row Python UDFs).  The scalar cores live in urlnorm.py / robots.py /
fetch_spec.py so the oracle can import them without Spark.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType, StringType

from . import urlnorm
from .robots import allowed as _robots_allowed


@pandas_udf(StringType())
def canon_urls(urls: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """U-1: canonicalize a column of absolute URLs (iterator form — one
    Python-side setup per partition, not per batch)."""
    for batch in urls:
        yield batch.map(urlnorm.canon_url)


@pandas_udf(StringType())
def resolve_links(base: pd.Series, ref: pd.Series) -> pd.Series:
    """U-2: vectorized RFC-3986 join of (base, possibly-relative ref).

    Hot path note: fetch-spec refs are absolute or path-absolute and are
    resolved by JVM built-ins in parse.py; this UDF is the general-case
    fallback for arbitrary relative refs.
    """
    return pd.Series(
        [urlnorm.resolve_url(b, r) for b, r in zip(base, ref)], dtype="object"
    )


@pandas_udf(StringType())
def host_of_urls(urls: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for batch in urls:
        yield batch.map(urlnorm.host_of)


@pandas_udf(BooleanType())
def robots_allowed(path: pd.Series, allow: pd.Series, disallow: pd.Series) -> pd.Series:
    """U-7: longest-prefix-match robots predicate (semantics of
    temoto/robotstxt — Google-style longest match, allow wins ties;
    SURVEY.md §3.2 F5)."""
    out = [
        _robots_allowed(p, a, d)
        for p, a, d in zip(path, allow, disallow)
    ]
    return pd.Series(out, dtype="bool")
