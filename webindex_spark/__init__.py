"""webindex_spark — a PySpark-native crawl/frontier analytics engine.

A from-scratch re-expression of the capabilities of astralway/webindex
(reference at /root/reference, Java/Fluo/Accumulo) as idiomatic PySpark:
DataFrame/SQL plans optimized by Catalyst, vectorized pandas/Arrow UDFs for
the row-level kernels (URL canonicalization, lexicoders, canonical JSON),
and snapshot-committed parquet tables standing in for Iceberg.

Modules
-------
functions.urlnorm    URL parse/canonicalize/validate (URL.java semantics)
functions.psl        vendored public-suffix snapshot + topPrivateDomain
functions.lexicoder  descending-count sort-key codec (IndexClient.revEncodeLong)
functions.pagejson   Gson-canonical Page JSON serializer
operators.index_batch  pages -> uri_counts/domain_counts/index rows (IndexUtil)
operators.delta      incremental diff/merge (Fluo observer semantics as batch)
operators.frontier   URL frontier + priority scheduling
operators.seen       partitioned-Bloom + exact URL-seen set
operators.politeness per-host token-bucket scheduling (window-based)
operators.robots     robots.txt gate (vectorized prefix match)
operators.images     image payload verify (PNG codec, phash, PSNR)
operators.dedup      exact/minhash/simhash/ngram dedup over documents
operators.simsearch  embedding cosine top-k (brute force + LSH-bucketed)
operators.textstats  language-ID, quality scoring, token counts
sources.snapshots    snapshot-parquet table layer (Iceberg-compatible seam)
config               YAML config with the reference's load semantics
plans.queries        the reference's 4 query shapes (IndexClient) as DataFrames
"""

__version__ = "0.1.0"
