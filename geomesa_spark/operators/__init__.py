"""Analytic operators: spatial join, kNN, density/tiling, stats, dedup,
similarity search, text analysis — each a DataFrame program, not an RDD."""
