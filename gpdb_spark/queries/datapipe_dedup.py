"""Populated in subsequent commits."""
