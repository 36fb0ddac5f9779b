"""Deterministic synthetic transcript fixtures + golden outputs."""
