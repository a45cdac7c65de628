"""Operator library: reference-parity relational operators plus the
north-star extension operators (dedup, similarity, text analysis,
multimodal), each exposed as a (spark, sf_dir) -> DataFrame builder
with a colocated DuckDB oracle SQL string where SQL-expressible.
"""
