"""Oracle-paired query definitions — importing this package populates
``sas_etl_spark.registry.QUERIES``.

Each module covers one SURVEY.md §2 family. Every query aliases its
computed columns identically to its oracle SQL and follows the parity
rules in registry.py's docstring.
"""

from sas_etl_spark.queries import (  # noqa: F401
    aggregations,
    audit_governance,
    cdc,
    complex_shapes,
    corpus_index,
    cube_sample,
    events_stream,
    hypothesis_tests,
    io_stream,
    joins,
    llm,
    pretrain,
    quality_gates,
    retrieval,
    row_transforms,
    scalars,
    robust_stats,
    setops_sorts,
    skew,
    text_curation,
    transpose_stats,
    udfs,
    windows,
)
