"""cs_insights_crawler_ray — a Ray-Data-native crawl/ingest engine.

A from-scratch re-expression of the capabilities of
``jpwahle/cs-insights-crawler`` (reference, read-only at /root/reference)
on top of ``ray.data.Dataset`` pipelines: Arrow batches end-to-end,
actor pools for stateful stages (URL-seen shards, fetch sessions,
robots cache), explicit partitioning for the wide steps, and
wave-granular checkpoint/resume.

Layout
------
- ``functions/`` — pure, vectorized kernels (URL canonicalization,
  hashing, the deterministic image codec, text analysis).
- ``fixtures/`` — seeded synthetic data: the content store (a pure
  function url -> page), payload tables, seed lists.
- ``sources/`` — readers and sinks (parquet/jsonl/csv, the
  Lance-abstracted payload sink, checkpoint manifests).
- ``state/`` — membership sketches (counting bloom, cuckoo) and the
  sharded URL-seen actor layer; politeness + robots policy.
- ``stages/`` — map_batches stage implementations (canonicalize,
  fetch, decode-verify, link explode).
- ``pipelines/`` — end-to-end pipelines: the crawl wave loop, the
  reference's relational core, dedup / ANN / text-analysis ops, and
  the sequential reference-semantics oracle simulator.
"""

__version__ = "0.1.0"
