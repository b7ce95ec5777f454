"""Relational operator compositions and extension operators.

``relational`` covers the reference's aggregate/pivot/argmax/histogram
inventory (SURVEY.md §2.2-2.3); ``dedup``/``similarity``/``multimodal`` are
the [extension] LLM-data-pipeline operator families (SURVEY.md §2.6).
"""
