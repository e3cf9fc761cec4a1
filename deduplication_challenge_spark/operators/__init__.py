"""Spark operators: each module is a set of ``DataFrame -> DataFrame``
transforms, declarative where Spark can express the semantics, Arrow-batched
pandas UDFs where it can't (SURVEY.md §7.3)."""
