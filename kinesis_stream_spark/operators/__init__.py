"""Extension operators: the LLM-data-pipeline surface built on the engine
core (SURVEY.md §2.3 extension rows; BASELINE north star).

- :mod:`dedup` — exact, MinHash+LSH, SimHash, n-gram Jaccard,
  embedding-cosine near-dup
- :mod:`similarity` — brute-force cosine top-k; hyperplane-LSH and IVF
  scale paths
- :mod:`text` — language ID, quality scoring, token counting, document
  fingerprints, tf-idf
- :mod:`multimodal` — opaque binary payloads + typed metadata; Arrow-batched
  decode/feature plumbing (decoders stubbed: no image/audio libs here)

All composed from DataFrame built-ins + the cross-engine hash/vector
primitives in :mod:`kinesis_stream_spark.functions`; Python appears only in
Arrow-batched ``mapInPandas`` where built-ins genuinely can't express the
work (multimodal decode).
"""
