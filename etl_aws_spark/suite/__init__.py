"""Query suite: binds engine operators to the driver's synthetic tables.

Importing this package registers every query in
:data:`etl_aws_spark.registry.REGISTRY`. Module per SURVEY.md §2 category.
"""

from etl_aws_spark.suite import (  # noqa: F401
    q_aggregates,
    q_changedata,
    q_cleaning,
    q_curation,
    q_graph,
    q_ingest,
    q_ml,
    q_multimodal,
    q_pipeline,
    q_relational,
    q_scalars,
    q_scans,
    q_showcase,
    q_similarity,
    q_sorts_dedup,
    q_streaming,
    q_temporal,
    q_text,
    q_timeseries,
    q_windows,
)
