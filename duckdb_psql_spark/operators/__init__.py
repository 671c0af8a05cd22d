"""Operators Spark lacks natively, plus the extended LLM-pipeline surface.

Parity operators (SURVEY.md §2.C "Joins"): :mod:`asof` (DuckDB ASOF JOIN),
:mod:`positional` (DuckDB POSITIONAL JOIN).

Extended operators (charter north star; SURVEY.md §7.2 step 8): :mod:`dedup`,
:mod:`similarity`, :mod:`text`, :mod:`multimodal`.
"""
