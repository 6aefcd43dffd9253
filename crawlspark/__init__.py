"""crawlspark — a from-scratch PySpark-native reimplementation of the crawl
loop of temoto/heroshi (URL frontier + fetch scheduler over interleaved
text+media span tables). See SURVEY.md (blueprint), SPEC.md (binding
round semantics), BASELINE.md (targets)."""

__version__ = "0.1.0"
