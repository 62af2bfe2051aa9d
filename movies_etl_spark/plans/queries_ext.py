"""North-star extension queries: dedup, similarity search, text analysis,
multimodal (filled in incrementally — see operators/{dedup,similarity,
text,multimodal}.py)."""

from __future__ import annotations
