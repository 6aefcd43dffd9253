"""Fixed, explicitly-declared schemas (SURVEY.md §2: never inferred).

The interleaved text+media document shape is the authoritative input
(BASELINE.json:15 ``input_hint``): ``doc_id:string,
spans:array<struct<kind:string,text:string,media_ref:string,offset:int>>``.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SPAN = StructType(
    [
        StructField("kind", StringType()),       # text | link | image | video
        StructField("text", StringType()),
        StructField("media_ref", StringType()),  # null for kind=text
        StructField("offset", IntegerType()),    # span order within doc — order IS data
    ]
)

SPANS = ArrayType(SPAN)

DOCUMENTS = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("url", StringType(), False),
        StructField("fetch_round", IntegerType(), False),
        StructField("status", IntegerType(), False),
        StructField("spans", SPANS, True),
        # request metadata carried through the fetch (io-worker result
        # records carry the job's metadata the same way) — lets the parse
        # path derive child priority/depth with NO join against the batch
        StructField("parent_priority", IntegerType(), False),
        StructField("parent_depth", IntegerType(), False),
    ]
)

# The fixture variant (FIXTURES.md §1) — exactly the input_hint shape.
DOCUMENTS_SPANS_FIXTURE = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("spans", SPANS, True),
    ]
)

FRONTIER = StructType(
    [
        StructField("url", StringType(), False),
        StructField("url_hash", LongType(), False),
        StructField("host", StringType(), False),
        StructField("host_hash", LongType(), False),
        StructField("priority", IntegerType(), False),
        StructField("crawl_depth", IntegerType(), False),
        StructField("discovered_round", IntegerType(), False),
        StructField("not_before_round", IntegerType(), False),
        StructField("state", StringType(), False),  # always 'pending'
        # per-host politeness, attached ONCE at ingest (robots broadcast
        # join on the new-rows delta) so the per-round scheduler reads
        # columns instead of re-joining the whole frontier every round
        StructField("host_budget", IntegerType(), False),
        StructField("delay_slots", IntegerType(), False),
    ]
)

SEEN = StructType(
    [
        StructField("url_hash", LongType(), False),
        StructField("url", StringType(), False),
        StructField("bucket", IntegerType(), False),
    ]
)

SEEN_BLOOM = StructType(
    [
        StructField("bucket", IntegerType(), False),
        StructField("blob", BinaryType(), True),
        StructField("m_bits", LongType(), False),
        StructField("k_hashes", IntegerType(), False),
        StructField("n_items", LongType(), False),
        # persisted explicitly so a resumed run grows/rebuilds at the exact
        # same points as a straight-through run (capacity is NOT derivable
        # from m_bits after a rebuild() to an arbitrary 2*len(hashes))
        StructField("capacity", LongType(), False),
    ]
)

CRAWL_ORDER = StructType(
    [
        StructField("round", IntegerType(), False),
        StructField("seq", LongType(), False),
        StructField("url", StringType(), False),
        StructField("url_hash", LongType(), False),
        StructField("host_hash", LongType(), False),
    ]
)

ROBOTS = StructType(
    [
        StructField("host", StringType(), False),
        StructField("allow_prefixes", ArrayType(StringType()), True),
        StructField("disallow_prefixes", ArrayType(StringType()), True),
        StructField("crawl_delay_slots", IntegerType(), False),
    ]
)

LINEAGE = StructType(
    [
        StructField("round", IntegerType(), False),
        StructField("stage", StringType(), False),
        StructField("partition_id", IntegerType(), False),
        StructField("rows", LongType(), False),
    ]
)

SEEDS = StructType([StructField("url", StringType(), False)])
