"""Dynamics networks for continuous flows."""
