"""invoice_extraction_ray — a Ray-Data-native structured-field extraction engine.

A from-scratch rebuild of the query/data-processing capabilities of the
reference `aasif-10/invoice-extraction` (see SURVEY.md), re-expressed as
per-turn main-content extraction over Parquet transcript tables:

    ray.data.read_parquet -> map_batches(normalize) -> map_batches(TurnClassifier
    actor pool) -> salted groupby(conv_id).map_groups(sort turn_idx) ->
    write_parquet with per-chunk lineage manifests.

Subpackages: stages/ (batch transforms), sources/ (IO), pipelines/ (composed
pipelines), state/ (checkpoint + resume), ops/ (generic relational / dedup /
similarity / text-analysis operator library), functions/ (scalar fn library).
"""

__version__ = "0.1.0"
