"""Embedding similarity search (SURVEY §2.13 north star).

Brute-force cosine top-k as the exactness baseline; random-hyperplane LSH
bucketing as the scale path; cosine-threshold near-duplicate pairs for
embedding dedup. Vector math stays JVM-side via higher-order functions
(`zip_with` dot products) — no Python in the hot path.
"""
