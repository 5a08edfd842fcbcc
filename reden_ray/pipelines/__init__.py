"""End-to-end pipelines wired from the stages."""
