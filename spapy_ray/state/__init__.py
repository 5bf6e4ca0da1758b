"""Run state: tile manifests, lineage records, resumable writes."""
