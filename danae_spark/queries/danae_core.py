"""A-block: danae-core operators (profiling, tf-idf, signatures, knn,
content/metadata/combined scoring). Populated incrementally — see SURVEY.md §2A.
"""

from __future__ import annotations
