"""Relational + corpus operators: filtering, domain stats, quality, dedup, similarity, skew."""
