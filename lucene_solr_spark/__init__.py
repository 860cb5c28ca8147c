"""lucene_solr_spark — a from-scratch PySpark-native re-creation of the
Lucene/Solr (4.0-SNAPSHOT) inverted-index build + BM25 query path.

Reference semantics (file:line cites are relative to /root/reference):
  - analysis: StandardAnalyzer pipeline
    (lucene/analysis/common/.../standard/StandardAnalyzer.java:110-116)
  - BM25 scoring: lucene/core/.../search/similarities/BM25Similarity.java
  - norm quantization: lucene/core/.../util/SmallFloat.java:78-99
  - tie-break: lucene/core/.../search/HitQueue.java:76-81

The architecture is Spark-first (DataFrame/Catalyst), NOT a port: the
reference is a single-JVM byte-level engine; this engine expresses the
same semantics as declarative DataFrame plans plus vectorized Arrow UDFs
for the tokenize/decode/score hot paths.
"""

__version__ = "0.1.0"
