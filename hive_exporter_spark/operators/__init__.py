"""Operators: the relational core, ingest strategies, and the
LLM-data-pipeline extensions (dedup / similarity / text / sessions)."""
