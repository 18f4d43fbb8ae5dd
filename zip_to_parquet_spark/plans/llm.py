"""LLM-data-pipeline queries: dedup, similarity, text analysis, multimodal.

Filled in milestone M3 (SURVEY.md §7).
"""

from __future__ import annotations
