"""Structured-streaming surface (SURVEY §2.8 ST1-ST7)."""
