"""Relational + kernel-wrapping operators of the engine."""
