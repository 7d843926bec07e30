"""DataFrame-level operators (extraction, matching, dedup, similarity, analysis)."""
