"""Ray Data stages: batch UDFs and actor-pool classes for the pipeline."""
