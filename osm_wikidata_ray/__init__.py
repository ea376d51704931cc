"""osm_wikidata_ray — a Ray-Data-native record-linkage engine.

Blocking-key candidate generation, pairwise name/address/identifier scoring,
and transitive clustering with the query semantics of EdwardBetts/osm-wikidata
(see SURVEY.md), re-expressed as streaming ray.data.Dataset pipelines.
"""

__version__ = "0.1.0"


def _install_empty_block_schema_filter() -> None:
    """Drop ONLY Ray's empty-block schema-divergence warning.

    Ray 2.49's sort-based shuffle builds schema-less empty blocks for reduce
    partitions that receive no rows, and the streaming executor then warns
    "Operator produced a RefBundle with a different schema … new schema: ."
    once per operator.  Every real schema defect in this repo is fixed at
    the source (metadata-free parquet reads via util.read_parquet_clean,
    Arrow outputs with declared schemas from grouped stages,
    combiner-tree aggregates for bounded-cardinality keys), so the only
    divergences left are this benign empty-block class, which no public
    Dataset API can prevent.  The filter matches the empty-schema message
    shape exactly — a genuine divergence between two non-empty schemas
    still surfaces."""
    import logging

    class _EmptyBlockSchemaDivergence(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:  # noqa: A003
            msg = record.getMessage()
            if "produced a RefBundle with a different schema" not in msg:
                return True
            empty = (
                "new schema: . This may" in msg
                or "names=[], types=[]). This may" in msg
            )
            return not empty

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_EmptyBlockSchemaDivergence())


_install_empty_block_schema_filter()
