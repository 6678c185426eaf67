"""Physical-plan policies: partitioning, skew salting, lineage, resume."""
