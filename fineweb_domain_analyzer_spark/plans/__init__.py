"""End-to-end job plans: the quality-filter pipeline and checkpoint/resume."""
