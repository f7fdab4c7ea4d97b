"""MAF input embeddings."""
