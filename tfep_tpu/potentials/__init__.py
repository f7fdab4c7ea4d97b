"""Potential-energy backends (engine boundary)."""
