"""Scalar function surface: domain extraction, text heuristics, scrub, robots."""
