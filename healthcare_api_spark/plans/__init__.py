"""Query frontends. ``search`` translates FHIR search parameters into
DataFrame plans (SURVEY.md §2.7, §3.3)."""

from healthcare_api_spark.plans.search import SearchEngine, SearchConfig

__all__ = ["SearchEngine", "SearchConfig"]
