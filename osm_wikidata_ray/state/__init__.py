"""Pipeline state: per-partition lineage manifests and resume."""
