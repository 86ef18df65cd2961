"""REST façade (SURVEY §7 phase 5)."""
