"""App layer: trainer and TFEP maps."""
