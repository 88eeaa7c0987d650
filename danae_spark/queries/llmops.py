"""C-block: LLM-data-pipeline operators (dedup, ANN, text analysis,
multimodal plumbing). Populated incrementally — see SURVEY.md §2C.
"""

from __future__ import annotations
