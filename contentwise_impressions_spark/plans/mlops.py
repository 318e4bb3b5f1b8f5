"""Similarity / model-fit operator suite (SURVEY.md §2.6-2.7).

Grows over rounds: cosine-family similarity kernel first, then scoring,
P3alpha/RP3beta, ALS, SLIM, EASE_R.
"""

from __future__ import annotations
