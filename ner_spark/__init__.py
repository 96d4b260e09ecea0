"""ner_spark — a from-scratch PySpark-native knowledge-graph construction
engine with the query/data-processing capabilities of the reference NER
pipeline (PKUjcy/NER family; see SURVEY.md for the reconstruction and
BASELINE.json for the authoritative functional spec).

Layout:
    session      SparkSession factory with scale-aware defaults
    io/          readers (parquet/iceberg-fallback, MSRA corpus) + committed writes
    ner/         numpy BiLSTM-CRF inference core, BIO/BMES decoders,
                 distributed mapInPandas tagger, single-process oracle
    kg/          co-occurrence triples, MinHash-LSH linking,
                 large-star/small-star connected components, materialize
    ops/         relational operator catalog (DuckDB-oracle-checked) +
                 training-data ops (dedup, similarity search, text analysis)
    fixtures/    deterministic synthetic transcript/gazetteer/model generators
    checkpoint/  per-partition lineage + idempotent resume
    streaming/   Structured Streaming face over the same stages
"""

__version__ = "0.1.0"
