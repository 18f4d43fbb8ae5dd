"""Reference-parity zip pipeline queries (SURVEY.md §2 A-F).

Filled in milestone M1.
"""

from __future__ import annotations
