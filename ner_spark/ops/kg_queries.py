"""KG-pipeline queries for the driver gate (filled in as stages land).

The transcripts table is synthesized deterministically from the
driver's sf parquet (see ner_spark.fixtures), so these run on any
sf_dir; they are rows-only checks (⊘) because the pipeline is not
ANSI-SQL-expressible over the pre-registered views.
"""

from __future__ import annotations
