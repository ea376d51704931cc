"""osm_wikidata_ray — a Ray-Data-native record-linkage engine.

Blocking-key candidate generation, pairwise name/address/identifier scoring,
and transitive clustering with the query semantics of EdwardBetts/osm-wikidata
(see SURVEY.md), re-expressed as streaming ray.data.Dataset pipelines.
"""

__version__ = "0.1.0"
