"""Ingestion loaders — Solr update-handler family re-expressed on
Spark sources (SURVEY.md §2.1 "Update ingest (XML/JSON/CSV)")."""
