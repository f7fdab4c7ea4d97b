"""Execution runtime: strategies, CLI tools, launchers, sharding."""
