"""Scalar helpers: glob compilation, hashing, vector math."""
