"""Plans: end-to-end pipelines and the named-query registry."""
